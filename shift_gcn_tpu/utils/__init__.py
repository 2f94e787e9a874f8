from shift_gcn_tpu.utils.logging import RunLogger  # noqa: F401
