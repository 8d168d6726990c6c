"""Fixture/oracle determinism — forensics hardening for CORRECTNESS_r03's
one red row (``cdc_agg_rollup`` hash_match=false, not reproducible at HEAD).

Pins down the two nondeterminism channels the round-3 verdict named:

1. **Chunk-layout sensitivity** in ``generate_cdc_log``'s base-table token
   flattening (generator.py): ``c.values`` on a *sliced* ListArray chunk
   returns the whole underlying buffer (offset ignored). The fix uses
   ``flatten()``; these tests feed the SAME logical base through different
   physical chunk layouts (single chunk, many chunks, sliced chunks) and
   assert byte-identical segment files.
2. **Cross-process reproducibility**: the full fixture pipeline (tokenized
   base → deterministic log → sequential python oracle) run twice in
   SEPARATE interpreter processes must hash identically — no dict-order,
   env, or allocator channel may leak into the bytes the driver compares.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from canal_spark.fixtures.generator import (CdcLogSpec, generate_base_table,
                                            generate_cdc_log)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dir_hashes(d: str) -> dict[str, str]:
    out = {}
    for name in sorted(os.listdir(d)):
        p = os.path.join(d, name)
        if os.path.isfile(p):
            out[name] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def _spec(n_events: int = 600) -> CdcLogSpec:
    return CdcLogSpec(
        n_events=n_events, seed=19, hot_frac=0.25, other_table_frac=0.05,
        pk_change_frac=0.02, events_per_file=200,
        ddl_script=[(n_events // 2,
                     "ALTER TABLE train.tokseq ADD COLUMN quality_tier STRING")])


def test_log_invariant_under_base_chunk_layout(tmp_path):
    """The SAME logical base through three physical chunk layouts — the log
    bytes must be identical. The sliced layout is the regression case: a
    sliced ListArray chunk's ``.values`` is the WHOLE buffer, so the
    pre-fix flattening would corrupt the token pool silently."""
    base = generate_base_table(300, seed=5)

    # layout A: as constructed (single chunk)
    # layout B: many small chunks
    chunks = [base.slice(i, 37) for i in range(0, base.num_rows, 37)]
    multi = pa.concat_tables(chunks)
    assert multi.column("tokens").num_chunks > 1
    # layout C: chunks that are genuinely SLICED arrays (non-zero offset) —
    # combine first so each slice shares one big buffer, then re-slice
    combined = base.combine_chunks()
    sliced = pa.concat_tables(
        [combined.slice(i, 61) for i in range(0, base.num_rows, 61)])
    offs = [c.offset for c in sliced.column("tokens").chunks]
    assert any(o > 0 for o in offs), "layout C must contain sliced chunks"

    hashes = []
    for tag, tbl in (("a", base), ("b", multi), ("c", sliced)):
        d = str(tmp_path / tag)
        generate_cdc_log(d, _spec(), base=tbl)
        hashes.append(_dir_hashes(d))
    assert hashes[0] == hashes[1] == hashes[2]


def test_misaligned_ntok_fails_loudly():
    """A base whose n_tok disagrees with its token arrays must raise, not
    silently misalign the pool."""
    base = generate_base_table(20, seed=5)
    bad = base.set_column(
        base.schema.get_field_index("n_tok"), "n_tok",
        pa.array([int(v.as_py()) + 1 for v in base.column("n_tok")],
                 pa.int32()))
    import pytest
    with pytest.raises(ValueError, match="misalign"):
        generate_cdc_log("/tmp/_canal_misalign_never_written", _spec(50),
                         base=bad)


_CHILD = r"""
import hashlib, json, os, sys
sys.path.insert(0, __REPO__)
import pyarrow.parquet as pq
from canal_spark.fixtures.generator import (CdcLogSpec, generate_base_table,
                                            generate_cdc_log)
from canal_spark.functions.tokenize import tokenize_table
from canal_spark.oracle import oracle_final_state

out = sys.argv[1]
# the full oracle fixture pipeline at the gate's shape: tokenize the sf0.001
# documents table, generate the deterministic log, fold it sequentially
base = tokenize_table(pq.read_table(
    "/root/testdata/sf0.001/documents.parquet")).sort_by("doc_id")
log_dir = os.path.join(out, "binlog")
spec = CdcLogSpec(n_events=800, seed=19, hot_frac=0.25, other_table_frac=0.05,
                  pk_change_frac=0.02, events_per_file=400,
                  ddl_script=[(400,
                    "ALTER TABLE train.tokseq ADD COLUMN quality_tier STRING")])
generate_cdc_log(log_dir, spec, base=base)
state, cols = oracle_final_state(base, log_dir)

h = hashlib.md5()
for name in sorted(os.listdir(log_dir)):
    p = os.path.join(log_dir, name)
    if os.path.isfile(p):
        h.update(name.encode()); h.update(open(p, "rb").read())
# canonical rendering of the folded state (sorted keys, sorted rows)
for doc_id in sorted(state):
    row = state[doc_id]
    h.update(json.dumps(
        {k: (list(v) if isinstance(v, (list, tuple)) else v)
         for k, v in sorted(row.items())},
        sort_keys=True, default=str).encode())
h.update(json.dumps(list(cols)).encode())
print(h.hexdigest())
"""


def test_fixture_and_oracle_cross_process_determinism(tmp_path):
    """Two fresh interpreters produce bit-identical log segments AND an
    identical sequential-oracle final state — the determinism evidence the
    round-3 verdict ordered (next #1b). PYTHONHASHSEED varies between the
    runs to flush any hash-order dependence."""
    script = _CHILD.replace("__REPO__", repr(_REPO))
    digests = []
    for i, seed in enumerate(["0", "12345"]):
        d = str(tmp_path / f"run{i}")
        os.makedirs(d)
        env = dict(os.environ, PYTHONHASHSEED=seed)
        r = subprocess.run([sys.executable, "-c", script, d],
                           capture_output=True, text=True, env=env,
                           timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        digests.append(r.stdout.strip().splitlines()[-1])
    assert digests[0] == digests[1]
