from . import catalog, pages, records, seeds  # noqa: F401
