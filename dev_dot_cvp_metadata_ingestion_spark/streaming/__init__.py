from .stream import stream_cv_pipeline, stream_file_metadata  # noqa: F401
