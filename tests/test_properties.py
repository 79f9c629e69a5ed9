"""Property-based tests (hypothesis) for the pure-logic layer: codec
round-trips and canonical-JSON invariants — the encoding discipline §1.3
correctness rests on."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkroach.chain import encoding

settings.register_profile("ci", max_examples=200, deadline=None)
settings.load_profile("ci")


@given(st.integers(0, 2**64 - 1), st.integers(0, 2**32 - 1))
def test_txn_token_roundtrip(round_, intra):
    tok = encoding.encode_txn_next_token(round_, intra)
    assert encoding.decode_txn_next_token(tok) == (round_, intra)
    assert "=" not in tok and "+" not in tok and "/" not in tok  # url-safe


@given(st.binary(min_size=32, max_size=32))
def test_address_roundtrip(pubkey):
    assert encoding.decode_address(encoding.encode_address(pubkey)) == pubkey


_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**63), 2**64 - 1),
    st.text(max_size=20),
    st.binary(max_size=20),
)
_json_like = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=8), inner, max_size=4),
        st.dictionaries(st.binary(min_size=1, max_size=8), inner, max_size=4),
    ),
    max_leaves=20,
)


@given(_json_like)
def test_canonical_json_is_valid_sorted_and_stable(obj):
    s = encoding.canonical_json(obj)
    parsed = json.loads(s)  # always valid JSON

    def check(node):
        if isinstance(node, dict):
            keys = list(node)
            assert keys == sorted(keys)  # canonical key order
            for v in node.values():
                # omit-empty: no empty value survives anywhere
                assert v not in (0, "", [], {}, False, None)
                check(v)
        elif isinstance(node, list):
            for v in node:
                check(v)

    check(parsed)
    # deterministic: same input → same bytes
    assert encoding.canonical_json(obj) == s


@given(st.dictionaries(st.binary(min_size=1, max_size=4), st.integers(1, 9), min_size=1, max_size=4))
def test_byte_keys_become_base64(d):
    import base64

    parsed = json.loads(encoding.canonical_json(d))
    for k in parsed:
        base64.b64decode(k)  # every key decodes as base64


@given(st.integers(0, 2**64 - 1))
def test_uint64_roundtrips_via_canonical_json(n):
    from decimal import Decimal

    assert json.loads(encoding.canonical_json({"v": Decimal(n)})).get("v", 0) == n


# -- TxnRow.Next semantics (idb.go:46-84) -------------------------------------

_txn_tree = st.recursive(
    st.fixed_dictionaries({"txn": st.fixed_dictionaries({"amt": st.integers(0, 100)})}),
    lambda inner: st.fixed_dictionaries(
        {
            "txn": st.fixed_dictionaries({"amt": st.integers(0, 100)}),
            "ad": st.fixed_dictionaries(
                {"dt": st.fixed_dictionaries({"itx": st.lists(inner, max_size=3)})}
            ),
        }
    ),
    max_leaves=12,
)


def _count_naive(t) -> int:
    inners = ((t.get("ad") or {}).get("dt") or {}).get("itx") or []
    return sum(1 + _count_naive(i) for i in inners)


@given(_txn_tree)
def test_count_inner_matches_naive_recursion(tree):
    assert encoding.count_inner_txns(json.dumps(tree)) == _count_naive(tree)


@given(
    st.integers(0, 2**40),
    st.integers(0, 2**20),
    st.one_of(st.none(), st.integers(0, 2**20)),
    st.booleans(),
    _txn_tree,
)
def test_next_token_decodes_to_reference_semantics(round_, intra, root_intra, asc, tree):
    """Decoded token == (round, base + asc·countInner) where base is the
    root's intra when the row is an inner row (RootIntra present)."""
    tj = json.dumps(tree)
    tok = encoding.txn_row_next_token(
        round_, intra, root_intra, asc,
        txn_json=None if root_intra is not None else tj,
        root_txn_json=tj if root_intra is not None else None,
    )
    base = intra if root_intra is None else root_intra
    expect = base + (encoding.count_inner_txns(tj) if asc else 0)
    assert encoding.decode_txn_next_token(tok) == (round_, expect)


# ---------------------------------------------------------------------------
# late-r4 numeric equivalences (pure logic, no Spark)
# ---------------------------------------------------------------------------


@given(st.integers(1, 10**12), st.integers(0, 10**12))
def test_hist_rank_cross_multiplication_equivalence(n, cum):
    """hist_quantile_sketch states cum >= ceil(q·n) two ways: the oracle
    uses integer division ((n+1)//2, (9n+9)//10), the Spark side uses
    cross-multiplication (2·cum >= n, 10·cum >= 9n).  They must agree on
    every integer input — this is the identity the hash match rests on."""
    assert (cum >= (n + 1) // 2) == (2 * cum >= n)
    assert (cum >= (9 * n + 9) // 10) == (10 * cum >= 9 * n)


@given(st.integers(3, 400), st.integers(1, 32))
def test_overcap_star_chain_pairs_are_linear_and_connected(n, k):
    """Reference implementation of the over-cap branch of
    capped_band_pairs / _capped_cand_sql for ONE bucket of n ranked
    members: K-star (rep rank i pairs with every later rank) plus the
    adjacent-rank chain, DISTINCT.  Pins the two claims SCALE.md makes:
    the pair count is linear in n (≤ (K+1)·n), and the pair graph
    connects the whole bucket (rank-1 alone reaches everyone through
    star-or-chain)."""
    pairs = set()
    for i in range(1, min(k, n - 1) + 1):  # K-star (1-based ranks)
        for j in range(i + 1, n + 1):
            pairs.add((i, j))
    for i in range(1, n):  # adjacent-rank chain
        pairs.add((i, i + 1))
    assert len(pairs) <= (k + 1) * n  # linear envelope
    if n > 2 * k + 2:  # genuinely sub-quadratic once n outgrows the star
        assert len(pairs) < n * (n - 1) // 2
    # connectivity: union-find over the emitted pairs
    parent = list(range(n + 1))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(1, n + 1)}) == 1


@given(
    st.lists(
        st.lists(st.integers(0, 2**32 - 1), max_size=40),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 16),
)
def test_kmv_sketch_merges_by_sort_and_truncate(partitions, k):
    """The KMV mergeability claim (kmv_type_jaccard's 100 TB story):
    per-partition k-smallest-distinct lists combine by sort-and-truncate
    into exactly the global sketch — for ANY partitioning of the
    elements and any k."""
    def sketch(values):
        return sorted(set(values))[:k]

    global_sketch = sketch([v for p in partitions for v in p])
    merged = sketch([h for p in partitions for h in sketch(p)])
    assert merged == global_sketch


# ---------------------------------------------------------------------------
# conduit_blocks offset frontier
# ---------------------------------------------------------------------------


@given(
    st.sets(st.integers(min_value=0, max_value=200), max_size=60),
    st.integers(min_value=0, max_value=50),
)
def test_next_contiguous_round_is_the_first_gap(present, start):
    """The source's offset frontier must be exactly the first round >=
    start missing from the feed directory: everything before it is
    deliverable in order, nothing at or after it may be delivered."""
    from sparkroach.sources.block_source import next_contiguous_round

    nxt = next_contiguous_round(present, start)
    assert nxt >= start
    assert nxt not in present
    assert all(r in present for r in range(start, nxt))


# ---------------------------------------------------------------------------
# JPEG / MJPEG-AVI codec properties (r6)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)  # DCT per example: keep bounded
@given(
    st.integers(1, 3),  # width in 8px tiles
    st.integers(1, 3),  # height in 8px tiles
    st.integers(0, 6),  # restart interval (0 = none)
    st.integers(0, 2**32 - 1),  # image seed
)
def test_jpeg_restart_interval_never_changes_pixels(tw, th, ri, seed):
    """encode(img, restart_interval=r) must decode to EXACTLY the same
    raster as encode(img) for every r — restarts reframe the entropy
    stream (byte alignment + DC predictor resets) without touching a
    single coefficient."""
    import numpy as np

    from sparkroach.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(8 * th, 8 * tw, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    rst = decode_jpeg(encode_jpeg(img, restart_interval=ri))
    assert (rst["rgb"] == base["rgb"]).all()
    assert rst["pixel_sum"] == base["pixel_sum"]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=6),
    st.integers(1, 3),
    st.integers(1, 3),
    st.integers(1, 60),
)
def test_avi_container_is_lossless_for_any_frame_sequence(
    frame_seeds, tw, th, fps
):
    """The RIFF/AVI container must return the EXACT JPEG bytes it was
    given, in order, with the header metadata intact — for any frame
    count, dimension, and fps (container losslessness is what makes the
    per-frame codec's exactness argument compose)."""
    import numpy as np

    from sparkroach.functions.avi import encode_avi_mjpeg, parse_avi_mjpeg
    from sparkroach.functions.jpeg import encode_jpeg

    w, h = 8 * tw, 8 * th
    frames = []
    for s in frame_seeds:
        rng = np.random.default_rng(s)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        frames.append(encode_jpeg(img, restart_interval=s % 3))
    avi = encode_avi_mjpeg(frames, w, h, fps=fps)
    v = parse_avi_mjpeg(avi)
    assert v["frames"] == frames  # byte-exact, order-preserving
    assert (v["width"], v["height"], v["n_frames"]) == (w, h, len(frames))
    assert v["handler"] == "MJPG"
    assert v["fps"] == 1_000_000 // (1_000_000 // fps)
