"""Forecasting (M1-M4) as Spark dataflow."""
