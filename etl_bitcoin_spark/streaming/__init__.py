from .tailer import BinlogTailer

__all__ = ["BinlogTailer"]
