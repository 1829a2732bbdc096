"""Second-source verification of the TS38.212 standards tables.

The base-graph shift data in ``spec/base_graphs.npz`` was originally parsed
out of the reference's transcription of TS38.212 Tables 5.3.2-2/-3
(get_3gpp_base_graph.m:12-530 via tools/extract_tables.py) — a single
provenance shared with the C++ oracle.  This module breaks that single line
of descent three ways:

1. **Spec-knowledge invariants**: structural facts of the 3GPP standard
   asserted from independent knowledge of TS38.212 / public NR LDPC
   literature, NOT read off the reference file — dimensions, edge counts,
   the exact quasi-cyclic skeleton (dense core rows, double-diagonal parity
   core, zero-shift extension identity), the weight-3 column shift pattern
   including its famous special cases (BG1 i_LS=6 shift 105; BG2
   i_LS in {3,7} shift 1), the lifting-size sets of Table 5.3.2-1, and the
   Section 5.1 CRC generator polynomials.
2. **An independent re-extraction**: a token-stream parser of the reference
   file sharing no code or parsing strategy with tools/extract_tables.py
   (which splits lines and matches the ``table{i} = [...]`` literal); every
   one of the 2 x (316+197) x 8 = 4,104+ shift entries and 513 (row, col)
   pairs is compared.  Skipped when /root/reference is not present.
3. **Pinned SHA-256 checksums** per (BG, i_LS) shift column and per
   structure, so any future corruption or regeneration drift fails loudly.
"""
import hashlib
import os
import re

import numpy as np
import pytest

from ldpc_3gpp_tpu.spec.tables import (
    ALL_LIFTING_SIZES,
    BG_DIMS,
    CRC_LENGTHS,
    CRC_POLYNOMIALS,
    LIFTING_SETS,
    base_graph,
)

REF_FILE = "/root/reference/get_3gpp_base_graph.m"


def _edges(bg):
    rows, cols, _ = base_graph(bg, 0)
    shifts = np.stack([base_graph(bg, i)[2] for i in range(8)], axis=1)
    return rows, cols, shifts  # (E,), (E,), (E, 8)


# ---------------------------------------------------------------------------
# 1. Spec-knowledge invariants (independent of the reference file)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bg,n_rows,n_cols,k_b,n_edges", [
    (1, 46, 68, 22, 316),
    (2, 42, 52, 10, 197),
])
def test_base_graph_skeleton(bg, n_rows, n_cols, k_b, n_edges):
    rows, cols, shifts = _edges(bg)
    assert BG_DIMS[bg] == (n_rows, n_cols, k_b)
    assert rows.shape == (n_edges,) and cols.shape == (n_edges,)
    assert shifts.shape == (n_edges, 8)
    # every row and column of the base matrix is used, indices in range
    assert set(rows.tolist()) == set(range(n_rows))
    assert set(cols.tolist()) == set(range(n_cols))
    # no duplicate (row, col) positions
    assert len({(r, c) for r, c in zip(rows, cols)}) == n_edges
    # all raw shift values V are in [0, 384) (applied as P = V mod Z)
    assert shifts.min() >= 0 and shifts.max() < 384

    # Extension parity structure: H_BG = [[A, B, 0], [C, D, I]].  Rows
    # 4..n_rows-1 each touch exactly one extension column (k_b+4 ...), on
    # the diagonal, with shift 0 in EVERY lifting set; the 4 core rows
    # touch none of them.
    ext = cols >= k_b + 4
    assert int(ext.sum()) == n_rows - 4
    np.testing.assert_array_equal(rows[ext], cols[ext] - (k_b + 4) + 4)
    np.testing.assert_array_equal(np.sort(rows[ext]), np.arange(4, n_rows))
    assert np.all(shifts[ext] == 0)
    assert not np.any((rows < 4) & ext)

    # The 2 punctured systematic columns (0 and 1, never transmitted) are
    # the two heaviest columns of the graph.
    weight = np.bincount(cols, minlength=n_cols)
    assert min(weight[0], weight[1]) > weight[2:].max()


def test_bg1_parity_core():
    """BG1 double-diagonal core (TS38.212 Table 5.3.2-2, rows 0-3).

    Column 22 has weight 3 with shifts (1, 0, 1) in rows (0, 1, 3) for
    every lifting set except i_LS = 6, where they are (0, 105, 0) — the
    special case every structure-aware NR encoder handles separately
    (summing the four core rows leaves p0 rotated by 0, resp. 105).
    The bidiagonal columns 23-25 all carry shift 0.
    """
    rows, cols, shifts = _edges(1)
    core = {(r, c): s for r, c, s in zip(rows, cols, shifts) if r < 4 and c >= 22}
    assert set(core) == {(0, 22), (0, 23), (1, 22), (1, 23), (1, 24),
                         (2, 24), (2, 25), (3, 22), (3, 25)}
    for pos in [(0, 23), (1, 23), (1, 24), (2, 24), (2, 25), (3, 25)]:
        assert np.all(core[pos] == 0), pos
    np.testing.assert_array_equal(core[(0, 22)], [1, 1, 1, 1, 1, 1, 0, 1])
    np.testing.assert_array_equal(core[(1, 22)], [0, 0, 0, 0, 0, 0, 105, 0])
    np.testing.assert_array_equal(core[(3, 22)], [1, 1, 1, 1, 1, 1, 0, 1])


def test_bg2_parity_core():
    """BG2 double-diagonal core (TS38.212 Table 5.3.2-3, rows 0-3).

    Column 10 has weight 3 in rows (0, 2, 3) with shifts (0, 1, 0) for
    every lifting set except i_LS in {3, 7}, where they are (1, 0, 1).
    The bidiagonal columns 11-13 all carry shift 0.
    """
    rows, cols, shifts = _edges(2)
    core = {(r, c): s for r, c, s in zip(rows, cols, shifts) if r < 4 and c >= 10}
    assert set(core) == {(0, 10), (0, 11), (1, 11), (1, 12), (2, 10),
                         (2, 12), (2, 13), (3, 10), (3, 13)}
    for pos in [(0, 11), (1, 11), (1, 12), (2, 12), (2, 13), (3, 13)]:
        assert np.all(core[pos] == 0), pos
    np.testing.assert_array_equal(core[(0, 10)], [0, 0, 0, 1, 0, 0, 0, 1])
    np.testing.assert_array_equal(core[(2, 10)], [1, 1, 1, 0, 1, 1, 1, 0])
    np.testing.assert_array_equal(core[(3, 10)], [0, 0, 0, 1, 0, 0, 0, 1])


def test_row_degree_sequences():
    """Check-node degree profiles of the two base graphs.

    BG1's four dense core rows have degree 19 and the first extension row
    degree 3; BG2's core rows alternate 8/10.  Full sequences pinned from
    the published degree profiles.
    """
    rows1, _, _ = _edges(1)
    assert np.bincount(rows1, minlength=46).tolist() == [
        19, 19, 19, 19, 3, 8, 9, 7, 10, 9, 7, 8, 7, 6, 7, 7, 6, 6, 6, 6,
        6, 6, 5, 5, 6, 5, 5, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 4, 5, 5, 4, 5,
        4, 5, 5, 4,
    ]
    rows2, _, _ = _edges(2)
    assert np.bincount(rows2, minlength=42).tolist() == [
        8, 10, 8, 10, 4, 6, 6, 6, 4, 5, 5, 5, 4, 5, 5, 4, 5, 5, 4, 4, 4,
        4, 3, 4, 4, 3, 5, 3, 4, 3, 5, 3, 4, 4, 4, 4, 4, 3, 4, 4, 4, 4,
    ]


def test_lifting_sets_table_5_3_2_1():
    """Table 5.3.2-1: Z = a * 2^j, a in {2,3,5,7,9,11,13,15}, Z <= 384."""
    expected = tuple(
        tuple(a * 2**j for j in range(8) if a * 2**j <= 384)
        for a in (2, 3, 5, 7, 9, 11, 13, 15)
    )
    assert LIFTING_SETS == expected
    assert len(ALL_LIFTING_SIZES) == 51
    assert len(set(ALL_LIFTING_SIZES)) == 51


def test_crc_polynomials_section_5_1():
    """Section 5.1 generator polynomials, cross-checked in hex form.

    CRC24A = 0x864CFB, CRC24B = 0x800063, CRC16 = 0x1021 (the CCITT
    polynomial) — the widely published representations with the leading
    z^L term dropped.
    """
    for name, hexval in [("CRC24A", 0x864CFB), ("CRC24B", 0x800063),
                         ("CRC16", 0x1021)]:
        L = CRC_LENGTHS[name]
        val = 0
        for p in CRC_POLYNOMIALS[name]:
            if p < L:  # drop the leading z^L term
                val |= 1 << p
        assert val == hexval, name


# ---------------------------------------------------------------------------
# 2. Independent re-extraction from the reference transcription
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.exists(REF_FILE),
                    reason="reference checkout not present")
def test_second_parse_of_reference_tables():
    """Token-stream re-parse of get_3gpp_base_graph.m, entry-by-entry.

    Unlike tools/extract_tables.py (regex on the ``table{i} = [...]``
    literal + per-line split), this strips comments, tokenizes every
    integer in the numeric blocks in document order, and rebuilds the edge
    lists as a flat stream of 10-tuples — a disjoint failure-mode profile
    (line continuation, comment, or block-boundary bugs in either parser
    surface as a mismatch here).
    """
    with open(REF_FILE) as f:
        lines = f.readlines()
    # keep only lines that are purely whitespace-separated integers
    stream = []
    breaks = []  # indices in `stream` where a non-numeric line intervened
    for ln in lines:
        ln = ln.split("%")[0].strip()
        toks = ln.split()
        if toks and all(re.fullmatch(r"-?\d+", t) for t in toks):
            stream.extend(int(t) for t in toks)
        else:
            breaks.append(len(stream))
    flat = np.array(stream, dtype=np.int64)
    assert flat.size == (316 + 197) * 10
    tuples = flat.reshape(-1, 10)
    for bg, n_edges, sl in [(1, 316, slice(0, 316)),
                            (2, 197, slice(316, 513))]:
        rows, cols, shifts = _edges(bg)
        t = tuples[sl]
        np.testing.assert_array_equal(t[:, 0], rows)
        np.testing.assert_array_equal(t[:, 1], cols)
        np.testing.assert_array_equal(t[:, 2:], shifts)
    # the two tables must be contiguous runs separated by a non-numeric line
    assert 316 * 10 in breaks


# ---------------------------------------------------------------------------
# 3. Pinned checksums (regression tripwire for the .npz artifact)
# ---------------------------------------------------------------------------

STRUCTURE_SHA256 = {
    1: "54ba7fead535b296ced024e242b216cce6c58194828fd3310f2cf90a7e776d76",
    2: "d5a7204f227b64f7bd36eef8130472b94fd02c266beed619549043124e98810d",
}

SHIFT_SHA256 = {
    1: [
        "66cdd4e583d2a0c8643c04f359567fcbafa7fbc34cccf007147f5dbb313a189a",
        "963cc63ff4592caa7fd349b47e11ec9ee3b4af471f0abe91f8dea53aa96ab309",
        "dcb487196e2267bffd201bf17b14235ef956d21738c5f4200bd44e1b291aa8b6",
        "68e446cae1e4c77b53eebaac2198b7d5afaf662d1b22c93ccdd0f62cb866823f",
        "2daf78ca2e966bd6937683a497ad0567e1a5f87b85d2eea24831ba4a7dbea2e3",
        "9182134b9f2bcd497ca461449b9516b68934f430df9f74bd207484cfb1afca03",
        "6979963c67fa2e586cd16e06be30f094ec05117bb51491ccc22e18368a53dd9f",
        "16ee865c624ff255c6403a539a01106c9a6e92e89aa81d2640f9eae6f6541d18",
    ],
    2: [
        "40b53b642871e0051c4c9271f31be8d55f4872c15af7fb54266566bd752a08f4",
        "8ffad47a27d56569b7c1ddf9c26e520c9408512be7092e9fb819c6aee374d7ba",
        "134346c376749fc5f64c084345a1ef705aef1d6ec3e98e9ca7e170ae5c78cd25",
        "39e75f055daeb6067e2c7b6bb153321fd3443305580e4e63a7005fc986c1c87c",
        "fe6d9c5e2fde90fb326aa6b2e8844ede093c692ff8f16d88b5425f2285af8c63",
        "b944e6bddb23a70e22783a6e59082af5c21f9a13e9f10db1fabff0f12ee04a13",
        "5bc0264e87c7a20c7c5355379189e0ca7f492a13c07a193498c7cc6cb56c2160",
        "e5d66b534f3aa451a7450a323b66db20302c975aa67b9b54057ee297260506d7",
    ],
}


@pytest.mark.parametrize("bg", [1, 2])
def test_table_checksums(bg):
    rows, cols, shifts = _edges(bg)
    struct = hashlib.sha256(
        np.stack([rows, cols]).astype("<i4").tobytes()
    ).hexdigest()
    assert struct == STRUCTURE_SHA256[bg]
    for i in range(8):
        h = hashlib.sha256(shifts[:, i].astype("<i4").tobytes()).hexdigest()
        assert h == SHIFT_SHA256[bg][i], f"BG{bg} i_LS={i}"
