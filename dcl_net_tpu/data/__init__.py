from dcl_net_tpu.data.schema import PoseBatch, make_batch, batch_to_jax  # noqa: F401
from dcl_net_tpu.data.synthetic import SyntheticPoseDataset  # noqa: F401
