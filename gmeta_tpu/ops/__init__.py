from gmeta_tpu.ops.spmm import aggregate, in_degrees  # noqa: F401
