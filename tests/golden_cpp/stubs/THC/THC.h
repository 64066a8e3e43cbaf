// Empty THC stub (legacy torch CUDA header named by bfs_cluster.h; the CPU
// clustering code never touches it).
#pragma once
