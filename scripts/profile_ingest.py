"""Span-instrumented profile of one 32-block ingest micro-batch.

Monkeypatches wall-clock spans around the serial gate region, each
table-plane task, and the metastate commit; prints a per-span table.
Usage: python scripts/profile_ingest.py [n_batches]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from sparkroach.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark("ingest-profile")
spark.range(1).collect()

import sparkroach.chain.store as store_mod
from sparkroach.chain.ingest import ChainDB
from sparkroach.chain.schemas import block_schema
from sparkroach.queries.chain_demo import GENESIS

SPANS: list[tuple[str, float, float]] = []
T0 = [0.0]


def _span(name):
    class _S:
        def __enter__(self):
            self.t = time.perf_counter()

        def __exit__(self, *a):
            SPANS.append((name, self.t - T0[0], time.perf_counter() - T0[0]))

    return _S()


_orig_append = store_mod.ChainStore.append_facts
_orig_merge = store_mod.ChainStore.merge_state
_orig_meta = store_mod.ChainStore.merge_metastate


def append_facts(self, table, rows):
    with _span(f"append:{table}"):
        return _orig_append(self, table, rows)


def merge_state(self, table, *a, **kw):
    with _span(f"merge:{table}"):
        return _orig_merge(self, table, *a, **kw)


def merge_metastate(self, updates):
    with _span("metastate"):
        return _orig_meta(self, updates)


store_mod.ChainStore.append_facts = append_facts
store_mod.ChainStore.merge_state = merge_state
store_mod.ChainStore.merge_metastate = merge_metastate

# build the same batch as chain_demo.ingest_blocks
from decimal import Decimal


def _blocks(n_blocks=32, n_txns=20):
    def pay(r, i):
        return {
            "txid": f"T{r}_{i}",
            "txn": {
                "type": "pay",
                "snd": bytes([i % 250 + 1]) * 32,
                "rcv": bytes([(i + 1) % 250 + 1]) * 32,
                "amt": Decimal(100 + i),
                "fee": 1000,
            },
            "sig": b"\x11" * 64,
        }

    return [
        {
            "round": r,
            "timestamp": 1_700_000_000 + r,
            "genesis_id": "bench",
            "genesis_hash": GENESIS,
            "rewards_level": 0,
            "txn_counter": 100 + r,
            "fee_sink": b"\xfe" * 32,
            "rewards_pool": b"\xaa" * 32,
            "payset": [pay(r, i) for i in range(n_txns)],
            "delta": {
                "accts": [
                    {"addr": bytes([i % 250 + 1]) * 32,
                     "microalgos": Decimal(10**6 + r * 100 + i)}
                    for i in range(n_txns)
                ],
                "asset_resources": [],
                "app_resources": [],
                "kv_mods": [],
            },
        }
        for r in range(n_blocks)
    ]


# also time the pre-fan-out serial region by spanning the gate collect:
import sparkroach.chain.ingest as ingest_mod

_orig_add = ingest_mod.ChainDB.add_blocks

for it in range(N):
    SPANS.clear()
    base = tempfile.mkdtemp(prefix="sparkroach_prof_")
    db = ChainDB(spark, os.path.join(base, "chain"), n_buckets=8)
    df = spark.createDataFrame(_blocks(), block_schema())
    t0 = time.perf_counter()
    T0[0] = t0
    with _span("TOTAL:add_blocks"):
        db.add_blocks(df)
    total = time.perf_counter() - t0
    first = min(
        s for name, s, _e in SPANS if not name.startswith("TOTAL")
    )
    print(f"--- run {it}: total={total:.3f}s  serial-pre-fanout={first:.3f}s")
    for name, s, e in sorted(SPANS, key=lambda x: x[1]):
        print(f"  {name:28s} {s:7.3f} -> {e:7.3f}  ({e - s:.3f}s)")
