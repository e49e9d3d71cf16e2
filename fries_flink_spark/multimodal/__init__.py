"""Multimodal package: binary media columns + Pandas-UDF transforms."""
