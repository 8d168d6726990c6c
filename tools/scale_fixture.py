"""Scale a generated binlog fixture R× by sharded key-space replication.

Models exactly the reference's sharded-upstream topology (GroupEventParser
merges N per-shard binlogs into one logical stream,
parse/.../group/GroupEventParser.java:23-60): each replica r rewrites every
doc_id with an "r{r}-" prefix, producing R disjoint key spaces whose events
interleave in LSN order. Pure pyarrow column surgery — no event-at-a-time
Python — so building a 10M-event input from a 1M-event log takes seconds,
not the hours the sequential generator would need.

Usage: python tools/scale_fixture.py <src_fixture_dir> <dst_dir> <R>
(src dir must contain binlog/ + base.parquet from bench.ensure_fixture)
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _prefix_struct_docid(col: pa.ChunkedArray, prefix: str) -> pa.Array:
    """Rebuild a before/after struct with doc_id prefixed (null-safe)."""
    out_chunks = []
    for chunk in col.chunks:
        fields = {f.name: chunk.field(i) for i, f in enumerate(chunk.type)}
        doc = fields["doc_id"]
        fields["doc_id"] = pc.binary_join_element_wise(
            pa.array([prefix] * len(doc), pa.string()), doc, "",
            null_handling="emit_null",
        )
        null_mask = pc.is_null(chunk)
        out_chunks.append(pa.StructArray.from_arrays(
            [fields[f.name] for f in chunk.type],
            fields=list(chunk.type),
            mask=null_mask.combine_chunks() if isinstance(null_mask, pa.ChunkedArray) else null_mask,
        ))
    return pa.chunked_array(out_chunks)


def scale_segment(t: pa.Table, prefix: str) -> pa.Table:
    for name in ("before", "after"):
        idx = t.schema.get_field_index(name)
        col = t.column(idx)
        if pa.types.is_string(col.type):
            # wire format: images are JSON strings — prefix the doc_id value
            new = pc.replace_substring(
                col, pattern='"doc_id":"', replacement=f'"doc_id":"{prefix}')
        else:
            new = _prefix_struct_docid(col, prefix)
        t = t.set_column(idx, t.schema.field(idx), new)
    # the native pk envelope columns (FlatMessage pkNames analog) are
    # AUTHORITATIVE for the collapse key — they must shard with the
    # payload, or every replica folds back onto replica 0's key space
    # and the scaled fixture silently measures a 1/R-sized workload
    for name in ("pk_before", "pk_after"):
        if name not in t.schema.names:
            continue
        idx = t.schema.get_field_index(name)
        col = t.column(idx)
        new = pc.binary_join_element_wise(
            pa.scalar(prefix, pa.string()), col, "",
            null_handling="emit_null")
        t = t.set_column(idx, t.schema.field(idx), new)
    return t


def main() -> None:
    src, dst, r_str = sys.argv[1:4]
    replicas = int(r_str)
    os.makedirs(os.path.join(dst, "binlog"), exist_ok=True)

    seg_paths = sorted(glob.glob(os.path.join(src, "binlog", "mysql-bin.*.parquet")))
    with open(os.path.join(src, "binlog", "log_manifest.json")) as f:
        manifest = json.load(f)

    out_no = 1
    files = []
    for r in range(replicas):
        prefix = "" if r == 0 else f"r{r}-"
        for p in seg_paths:
            t = pq.read_table(p)
            if prefix:
                t = scale_segment(t, prefix)
            name = f"mysql-bin.{out_no:06d}.parquet"
            pq.write_table(t, os.path.join(dst, "binlog", name),
                           compression="zstd", row_group_size=16384)
            files.append(name)
            out_no += 1

    base = pq.read_table(os.path.join(src, "base.parquet"))
    parts = [base]
    for r in range(1, replicas):
        doc = base.column("doc_id")
        pref = pc.binary_join_element_wise(
            pa.array([f"r{r}-"] * len(doc), pa.string()),
            doc.combine_chunks(), "")
        parts.append(base.set_column(
            base.schema.get_field_index("doc_id"),
            base.schema.field("doc_id"), pref))
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "base.parquet"))

    manifest = dict(manifest)
    manifest["n_events"] = manifest["n_events"] * replicas
    manifest["files"] = files
    manifest["replicas"] = replicas
    with open(os.path.join(dst, "binlog", "log_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps({"dst": dst, "n_events": manifest["n_events"],
                      "segments": len(files)}))


if __name__ == "__main__":
    main()
