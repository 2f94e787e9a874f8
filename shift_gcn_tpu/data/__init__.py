from shift_gcn_tpu.data.feeder import BatchIterator, Feeder  # noqa: F401
