from mds_tpu.data.labels import DatasetSpec, load_specs  # noqa: F401
