"""Golden parity for the eval METRIC math against the reference's own code.

The README headline numbers (95.8/96.6 ADD-S AUC, 99.0 <2cm) flow through
VOCap / cal_auc_acc / cal_metric_auc_acc in the reference's eval tools
(tools/test_YCBV_stage1.py:83-125). Those are pure numpy functions — this
module imports them from /root/reference (open3d/gorilla/tqdm/tensorboardX
stubbed; module level only defines functions) and drives them against
eval/metrics.py on shared random distance lists covering the protocol's
edge cases: lost detections (inf), distances beyond the 0.1 m cap, values
straddling the 2 cm accuracy threshold.

Known deliberate divergences (outside the protocol's reachable inputs):
- VOCap's monotonize loop: the reference iterates range(1, prec.shape[0]),
  ours covers all of mpre — identical whenever prec is monotone, which
  cal_auc_acc guarantees (prec is a cumulative count).
- Empty classes: the reference's cal_dis_acc divides 0/0 -> nan; ours
  returns 0.0. Real eval always has >=1 sample per class.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

from dcl_net_tpu.eval.metrics import auc_and_acc, per_class_auc_acc, voc_ap
from tests.ref_tools import import_ref_tool


class _SilentLogger:
    def warning(self, *a, **kw):
        pass


@pytest.fixture(scope="module")
def ref_tool():
    return import_ref_tool("tools/test_YCBV_stage1.py", "ref_test_ycbv_stage1")


def _protocol_distances(rng, n, lost_frac=0.1):
    """Distance lists as the YCBV eval loop produces them: metres, mostly
    small, some beyond the 0.1 cap, lost detections as inf
    (reference tools/test_YCBV_stage1.py:186-199)."""
    d = rng.gamma(1.5, 0.02, n)
    d[rng.rand(n) < lost_frac] = np.inf
    # exact threshold hits: both sides must treat 0.02/0.1 identically
    d[: max(1, n // 20)] = 0.02
    d[max(1, n // 20) : max(2, n // 10)] = 0.1
    return d


def test_auc_acc_matches_reference_code(ref_tool):
    rng = np.random.RandomState(0)
    for trial in range(20):
        d = _protocol_distances(rng, rng.randint(1, 400))
        ref_auc, ref_acc = ref_tool.cal_auc_acc(list(d))
        our_auc, our_acc = auc_and_acc(list(d))
        np.testing.assert_allclose(our_auc, ref_auc, rtol=1e-12, err_msg=str(trial))
        np.testing.assert_allclose(our_acc, ref_acc, rtol=1e-12, err_msg=str(trial))


def test_auc_all_lost_matches_reference_code(ref_tool):
    d = [np.inf] * 7
    assert ref_tool.cal_auc_acc(d)[0] == 0.0
    assert auc_and_acc(d)[0] == 0.0


def test_per_class_report_matches_reference_code(ref_tool):
    rng = np.random.RandomState(1)
    n = 2000
    d = _protocol_distances(rng, n)
    # every class occupied (reference nan's on empty classes; ours returns 0)
    cls = np.concatenate([np.arange(21), rng.randint(0, 21, n - 21)])
    rng.shuffle(cls)

    ref_mean = ref_tool.cal_metric_auc_acc(list(d), list(cls), _SilentLogger())
    ours = per_class_auc_acc(d, cls, num_classes=21)
    np.testing.assert_allclose(ours["auc_mean"], ref_mean, rtol=1e-12)
    for idx in range(21):
        ref_auc, ref_acc = ref_tool.cal_auc_acc(list(d[cls == idx]))
        np.testing.assert_allclose(ours["auc_per_class"][idx], ref_auc, rtol=1e-12)
        np.testing.assert_allclose(ours["acc_per_class"][idx], ref_acc, rtol=1e-12)


def test_vocap_matches_reference_on_monotone_curves(ref_tool):
    rng = np.random.RandomState(2)
    for _ in range(10):
        n = rng.randint(2, 100)
        rec = np.sort(rng.uniform(0, 0.1, n))
        prec = np.cumsum(np.ones(n)) / n  # monotone, as cal_auc_acc builds it
        np.testing.assert_allclose(
            voc_ap(rec, prec), ref_tool.VOCap(rec, prec), rtol=1e-12
        )
