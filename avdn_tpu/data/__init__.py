from avdn_tpu.data.synthetic import synthetic_world, SyntheticWorld

__all__ = ["synthetic_world", "SyntheticWorld"]
