// Empty stub: the reference's CPU voxelize path never touches CUDA; the
// include exists only because voxelize.h is shared with the .cu build.
#pragma once
