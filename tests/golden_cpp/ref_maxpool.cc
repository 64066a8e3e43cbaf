// Test-only driver around the reference's OWN CPU max-pool functors
// (libs/spconv/src/spconv/maxpool.cc:20-91, the tv::CPU specializations the
// reference registers for SparseMaxPool/SparseFieldMaxPool), included
// UNMODIFIED with torch/CUDA stubbed (the functors touch neither).
//
// The drivers reproduce pool_ops.h's per-offset loop (indiceMaxPool
// :27-62, indiceFieldMaxPool :64-111, indiceMaxPoolBackward :113-139)
// including its torch::zeros output initialization — which means the
// reference's max pool CLAMPS all-negative receptive fields at 0 (the
// commented-out "smallest" line at pool_ops.h:38-39 shows this is shipped
// behavior, not an accident).

#include <cstdint>

#include <spconv/maxpool.h>

// the reference's CPU functor definitions, via -I<reference>/libs/spconv
#include <src/spconv/maxpool.cc>

using Index = int;

// indice_pairs: [K, 2, L] exactly as built by the rulebook driver;
// out is caller-zeroed ([num_out, C]); in is [num_in, C].
extern "C" void ref_maxpool_fwd(float *out, const float *in,
                                const int *indice_pairs, const int *indice_num,
                                int kv, int pair_cap, int num_out, int num_in,
                                int c) {
  tv::TensorView<float> t_out(out, {num_out, c});
  tv::TensorView<const float> t_in(in, {num_in, c});
  spconv::functor::SparseMaxPoolForwardFunctor<tv::CPU, float, Index> ftor;
  for (int k = 0; k < kv; ++k) {
    if (indice_num[k] <= 0) continue;
    tv::TensorView<const Index> pairs(indice_pairs + k * 2 * pair_cap,
                                      {2, pair_cap});
    ftor(tv::CPU(), t_out, t_in, pairs, indice_num[k]);
  }
}

extern "C" void ref_maxpool_bwd(const float *out, const float *in,
                                const float *dout, float *din,
                                const int *indice_pairs, const int *indice_num,
                                int kv, int pair_cap, int num_out, int num_in,
                                int c) {
  tv::TensorView<const float> t_out(out, {num_out, c});
  tv::TensorView<const float> t_in(in, {num_in, c});
  tv::TensorView<const float> t_dout(dout, {num_out, c});
  tv::TensorView<float> t_din(din, {num_in, c});
  spconv::functor::SparseMaxPoolBackwardFunctor<tv::CPU, float, Index> ftor;
  for (int k = 0; k < kv; ++k) {
    if (indice_num[k] <= 0) continue;
    tv::TensorView<const Index> pairs(indice_pairs + k * 2 * pair_cap,
                                      {2, pair_cap});
    ftor(tv::CPU(), t_out, t_in, t_dout, t_din, pairs, indice_num[k]);
  }
}

// field max pool: features [num, F*C] with per-plane norms [num, F*C]
// (field norms replicated over the C components, pool.py get_field_norm).
extern "C" void ref_field_maxpool_fwd(float *out, const float *in,
                                      float *out_norms, const float *in_norms,
                                      const int *indice_pairs,
                                      const int *indice_num, int kv,
                                      int pair_cap, int num_out, int num_in,
                                      int c) {
  tv::TensorView<float> t_out(out, {num_out, c});
  tv::TensorView<const float> t_in(in, {num_in, c});
  tv::TensorView<float> t_onorm(out_norms, {num_out, c});
  tv::TensorView<const float> t_inorm(in_norms, {num_in, c});
  spconv::functor::SparseFieldMaxPoolForwardFunctor<tv::CPU, float, Index>
      ftor;
  for (int k = 0; k < kv; ++k) {
    if (indice_num[k] <= 0) continue;
    tv::TensorView<const Index> pairs(indice_pairs + k * 2 * pair_cap,
                                      {2, pair_cap});
    ftor(tv::CPU(), t_out, t_in, pairs, indice_num[k], t_inorm, t_onorm);
  }
}
