// Test-only driver around the reference's OWN CPU clustering
// (libs/pointgroup_ops/src/bfs_cluster/bfs_cluster.cpp:28-86 find_cc /
// get_clusters / fill_cluster_idxs_ — the semantic-constrained BFS behind
// pointgroup_ops.bfs_cluster), included UNMODIFIED with torch/CUDA/THC
// stubbed (the clustering itself touches none of them; the GPU ball-query
// launcher is satisfied with a never-called dummy definition).
//
// tests/test_golden_bfs.py drives this against ops/extras.bfs_cluster.

#include <cassert>  // transitively provided by real torch headers
#include <cstdint>
#include <limits>   // transitively provided by real torch headers

#include "datatype/datatype.cpp"
#include "bfs_cluster/bfs_cluster.cpp"

// never called: the CPU clustering path doesn't touch the GPU ball query
int ballquery_batch_p_cuda(int, int, float, const float *, const int *,
                           const int *, int *, int *, cudaStream_t) {
  return 0;
}

extern "C" int ref_bfs_cluster(
    const int *semantic_label,   // [n]
    const int *ball_query_idxs,  // [n_active]
    const int *start_len,        // [n, 2]
    int n, int threshold,
    int *cluster_idxs,           // [cap, 2] out
    int *cluster_offsets,        // [n+1] out, zeroed
    int *n_cluster_out) {
  ConnectedComponents ccs;
  int sum = get_clusters(const_cast<int *>(semantic_label),
                         const_cast<Int *>(ball_query_idxs),
                         const_cast<int *>(start_len), n, threshold, ccs);
  *n_cluster_out = (int)ccs.size();
  cluster_offsets[0] = 0;
  fill_cluster_idxs_(ccs, cluster_idxs, cluster_offsets);
  return sum;
}
