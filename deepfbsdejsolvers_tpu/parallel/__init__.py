from deepfbsdejsolvers_tpu.parallel.data_parallel import (
    make_mesh,
    make_dp_loss,
    make_dp_update,
)

__all__ = ["make_mesh", "make_dp_loss", "make_dp_update"]
