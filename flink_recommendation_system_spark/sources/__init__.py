from .tables import load_table, reviews_from_events  # noqa: F401
