from .sources import RateSourceTailer, rate_binlog_stream
from .tailer import BinlogTailer

__all__ = ["BinlogTailer", "RateSourceTailer", "rate_binlog_stream"]
