from mds_tpu.losses.ohem_ce import OhemCELoss, MdsOhemCELoss, cross_entropy_per_pixel  # noqa: F401
