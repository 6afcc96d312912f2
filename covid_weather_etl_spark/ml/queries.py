"""ML-layer registry entries (filled in after the relational spine):
per-group `applyInPandas` forecasting and Spark ML classification.
"""
