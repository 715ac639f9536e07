from .validation import validate, validation_details, skip_flag_exprs  # noqa: F401
