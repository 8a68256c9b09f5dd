from colbwt_tpu.pipeline.build import build_pipeline, query_pipeline  # noqa: F401
