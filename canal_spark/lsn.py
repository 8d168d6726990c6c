"""Log sequence number (LSN) encoding.

The reference orders change events by the tuple
(gtid, binlog file name, byte offset) — Canal `Header.logfileName` /
`logfileOffset` / `gtid` (protocol/EntryProtocol.proto:25-73) and resume
positions `EntryPosition(journalName, position, gtid)`
(protocol/.../position/EntryPosition.java:9-43).

We encode the same tuple as ONE lexicographically-ordered string so a single
column can serve as the sort key, the `_source_lsn` bookkeeping column on the
sink, and the idempotence guard for MERGE. Zero-padding widths make string
order == numeric order; binlog file names ("mysql-bin.000001") are already
lexicographically monotone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GTID_WIDTH = 12
POS_WIDTH = 12

# full-width floor: sorts before every real LSN, same width — so suffix
# tricks (lsn || '~x' sorting right after lsn) stay valid on seed rows
# whose _source_lsn is empty
ZERO_LSN = f"{0:0{GTID_WIDTH}d}:mysql-bin.000000:{0:0{POS_WIDTH}d}"


def encode_lsn_py(gtid_seq: int, binlog_file: str, binlog_pos: int) -> str:
    return f"{gtid_seq:0{GTID_WIDTH}d}:{binlog_file}:{binlog_pos:0{POS_WIDTH}d}"


def encode_lsn_col(
    gtid_seq: Column | str = "gtid_seq",
    binlog_file: Column | str = "binlog_file",
    binlog_pos: Column | str = "binlog_pos",
) -> Column:
    """Column expression building the sortable LSN string (pure JVM-side)."""
    g = F.col(gtid_seq) if isinstance(gtid_seq, str) else gtid_seq
    f = F.col(binlog_file) if isinstance(binlog_file, str) else binlog_file
    p = F.col(binlog_pos) if isinstance(binlog_pos, str) else binlog_pos
    return F.concat_ws(
        ":",
        F.lpad(g.cast("string"), GTID_WIDTH, "0"),
        f,
        F.lpad(p.cast("string"), POS_WIDTH, "0"),
    )


def decode_lsn_py(lsn: str) -> tuple[int, str, int]:
    gtid, file, pos = lsn.split(":")
    return int(gtid), file, int(pos)
