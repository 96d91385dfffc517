"""Spark DataFrame operators and stages of the extraction engine."""
