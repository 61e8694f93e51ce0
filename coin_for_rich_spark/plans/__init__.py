from .reader import read_ohlcvs, route_interval, VALID_INTERVALS

__all__ = ["read_ohlcvs", "route_interval", "VALID_INTERVALS"]
