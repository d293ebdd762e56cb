from . import grouping, joins, positional, sorting, timeseries, windows

__all__ = ["grouping", "joins", "positional", "sorting", "timeseries", "windows"]
