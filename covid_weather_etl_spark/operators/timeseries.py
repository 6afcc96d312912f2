"""Composite time-series operators (seasonal decompose, interpolation).

Filled in after the relational spine: W8 (seasonal_decompose as
window + groupBy composition) and W9 (linear gap interpolation).
"""
