// Test-only driver around the reference's OWN GPU average-pool + summaryRF
// functors (libs/spconv/src/spconv/avgpool.cu, summaryRF.cu) — the DCL
// authors' custom spconv additions behind SparseAvgPool3d(use_gs=False),
// which the backbone runs FOUR TIMES per forward (models/Modules.py:153-158).
// These two files are CUDA-ONLY in the reference (no CPU twin like
// maxpool.cc), so until now our sparse_avg_pool's "divide by receptive-field
// population" semantics were matched against a numpy re-derivation
// (test_golden_rulebook.py:330). Here the functors are compiled from the
// reference checkout via stubs/cuda_serial.h (only the <<<>>> launch syntax
// rewritten, bodies byte-identical) and run serially.
//
// Thread-independence: within ONE kernel offset, every output row appears
// at most once in the pair list (rulebook invariant), so summaryRF's
// `num_RF[out] += 1` and avgpool's read-modify-write on outFeatures touch
// disjoint cells across threads — the same invariant the reference's
// non-atomic GPU code depends on. Serial execution is therefore exact.
//
// The per-offset functor loops below mirror the reference's own callers
// (indiceSummaryRF pool_ops.h:141-171, indiceAvgPool :173-210,
// indiceAvgPoolBackward :212-246), including their torch::zeros output
// initialization (caller-zeroed arrays).

#include <cstdint>

#include <cuda_serial.h>

#include <spconv/avgpool.h>
#include <spconv/summaryRF.h>

#include <spconv_avgpool_gpu.cu.inc>
#include <spconv_summaryrf_gpu.cu.inc>

using Index = int;

// indice_pairs: [kv, 2, pair_cap] exactly as the rulebook builds them.
extern "C" void ref_summary_rf(const int *indice_pairs, const int *indice_num,
                               int kv, int pair_cap, int num_act,
                               int *num_rf /* caller-zeroed [num_act] */) {
  tv::TensorView<int> rf(num_rf, {num_act});
  spconv::functor::SummaryRFForwardFunctor<tv::GPU, Index> ftor;
  for (int k = 0; k < kv; ++k) {
    if (indice_num[k] <= 0) continue;
    tv::TensorView<const Index> pairs(indice_pairs + k * 2 * pair_cap,
                                      {2, pair_cap});
    ftor(tv::GPU(), pairs, rf, indice_num[k]);
  }
}

extern "C" void ref_avgpool_fwd(float *out /* caller-zeroed */,
                                const float *in, const int *indice_pairs,
                                const int *indice_num, int kv, int pair_cap,
                                int num_out, int num_in, int c,
                                const int *summaryrf) {
  tv::TensorView<float> t_out(out, {num_out, c});
  tv::TensorView<const float> t_in(in, {num_in, c});
  tv::TensorView<const Index> rf(summaryrf, {num_out});
  spconv::functor::SparseAvgPoolForwardFunctor<tv::GPU, float, Index> ftor;
  for (int k = 0; k < kv; ++k) {
    if (indice_num[k] <= 0) continue;
    tv::TensorView<const Index> pairs(indice_pairs + k * 2 * pair_cap,
                                      {2, pair_cap});
    ftor(tv::GPU(), t_out, t_in, pairs, indice_num[k], rf);
  }
}

extern "C" void ref_avgpool_bwd(const float *out, const float *in,
                                const float *dout,
                                float *din /* caller-zeroed */,
                                const int *indice_pairs,
                                const int *indice_num, int kv, int pair_cap,
                                int num_out, int num_in, int c,
                                const int *summaryrf) {
  tv::TensorView<const float> t_out(out, {num_out, c});
  tv::TensorView<const float> t_in(in, {num_in, c});
  tv::TensorView<const float> t_dout(dout, {num_out, c});
  tv::TensorView<float> t_din(din, {num_in, c});
  tv::TensorView<const Index> rf(summaryrf, {num_out});
  spconv::functor::SparseAvgPoolBackwardFunctor<tv::GPU, float, Index> ftor;
  for (int k = 0; k < kv; ++k) {
    if (indice_num[k] <= 0) continue;
    tv::TensorView<const Index> pairs(indice_pairs + k * 2 * pair_cap,
                                      {2, pair_cap});
    ftor(tv::GPU(), t_out, t_in, t_dout, t_din, pairs, indice_num[k], rf);
  }
}
