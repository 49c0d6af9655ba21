from .binlog import BinlogSpec, generate_binlog, oracle_replay, write_segments

__all__ = ["BinlogSpec", "generate_binlog", "oracle_replay", "write_segments"]
