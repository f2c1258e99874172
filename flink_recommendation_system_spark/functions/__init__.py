from .pandas_fns import cosine_pairs_pandas, rating_zscore  # noqa: F401
