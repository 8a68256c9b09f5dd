from colbwt_tpu.pipeline.build import build_pipeline, query_pipeline  # noqa: F401
from colbwt_tpu.pipeline.stream import query_stream  # noqa: F401
