"""Golden parity for trainer-layer policies against the reference's own code.

- AutoClip: the reference's class (tools/train_YCBV_stage1.py:212-231) is
  imported and driven on a tiny torch module with manually-set grads; our
  optax transform must clip identically (within the ring-buffer window —
  the documented deviation from the reference's unbounded history).
- LR schedules: the reference uses torch.optim.lr_scheduler.CyclicLR
  (tools/train_YCBV_stage1.py:278, stepped per iteration :142) and StepLR;
  torch itself is the golden side here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from dcl_net_tpu.train.solver import autoclip, cyclic_lr, step_lr  # noqa: E402
from tests.ref_tools import import_ref_tool  # noqa: E402


@pytest.fixture(scope="module")
def ref_train_tool():
    return import_ref_tool("tools/train_YCBV_stage1.py", "ref_train_ycbv_stage1")


def test_autoclip_matches_reference_code(ref_train_tool):
    rng = np.random.RandomState(0)
    shapes = [(4, 3), (7,)]
    model = torch.nn.ParameterList(
        [torch.nn.Parameter(torch.zeros(s)) for s in shapes]
    )
    ref_clip = ref_train_tool.AutoClip(percentile=50)

    ours = autoclip(percentile=50.0, history_len=64)
    state = ours.init(None)

    for step in range(30):
        grads = [rng.randn(*s).astype(np.float32) * rng.uniform(0.1, 8.0)
                 for s in shapes]
        for p, g in zip(model.parameters(), grads):
            p.grad = torch.from_numpy(g.copy())
        ref_clip(model)
        ref_out = [p.grad.numpy().copy() for p in model.parameters()]

        updates = {str(i): jnp.asarray(g) for i, g in enumerate(grads)}
        clipped, state = ours.update(updates, state)
        for i in range(len(shapes)):
            # torch clip_grad_norm_ uses norm/(total+1e-6); allow that epsilon
            np.testing.assert_allclose(
                np.asarray(clipped[str(i)]), ref_out[i], rtol=3e-5, atol=1e-7,
                err_msg=f"step {step} param {i}",
            )


def _torch_lr_sequence(sched_cls, n_steps, **kwargs):
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = sched_cls(opt, **kwargs)
    lrs = []
    for _ in range(n_steps):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return np.asarray(lrs)


def test_cyclic_lr_matches_torch_scheduler():
    """Per-iteration CyclicLR exactly as the reference builds it
    (cycle_momentum=False, triangular), incl. asymmetric up/down."""
    for base, mx, up, down in [
        (1e-6, 1e-3, 100, 100),
        (1e-5, 5e-3, 37, 113),
        (1e-6, 1e-3, 63105, 63105),  # the reference YCBV config
    ]:
        n = min(3 * (up + down), 1200)
        ref = _torch_lr_sequence(
            torch.optim.lr_scheduler.CyclicLR, n,
            base_lr=base, max_lr=mx, step_size_up=up, step_size_down=down,
            cycle_momentum=False,
        )
        ours = np.asarray([float(cyclic_lr(base, mx, up, down)(i)) for i in range(n)])
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-12,
                                   err_msg=f"{base},{mx},{up},{down}")


def test_step_lr_matches_torch_scheduler():
    for step_size, gamma in [(60, 0.5), (7, 0.3)]:
        n = 4 * step_size
        ref = _torch_lr_sequence(
            torch.optim.lr_scheduler.StepLR, n, step_size=step_size, gamma=gamma
        )
        ours = np.asarray([float(step_lr(1.0, step_size, gamma)(i)) for i in range(n)])
        np.testing.assert_allclose(ours, ref, rtol=1e-6,
                                   err_msg=f"{step_size},{gamma}")
