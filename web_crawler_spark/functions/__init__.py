from . import scalars, text, urltools, vectors  # noqa: F401
