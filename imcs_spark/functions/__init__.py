from . import elementwise, aggregates

__all__ = ["elementwise", "aggregates"]
