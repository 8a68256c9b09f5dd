from colbwt_tpu.models.index import ColPmlIndex  # noqa: F401
