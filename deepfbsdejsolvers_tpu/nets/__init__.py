from deepfbsdejsolvers_tpu.nets.mlp import MLPSpec, init_mlp, mlp_apply, get_activation

__all__ = ["MLPSpec", "init_mlp", "mlp_apply", "get_activation"]
