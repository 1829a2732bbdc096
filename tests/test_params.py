"""Parameter-engine tests against TS38.212 rules (SURVEY.md section 2.1 #1)."""
import pytest

from ldpc_3gpp_tpu.spec.params import LDPCParams
from ldpc_3gpp_tpu.spec.tables import (
    ALL_LIFTING_SIZES,
    LIFTING_SETS,
    UnsupportedParameters,
    base_graph,
    lifting_size,
    set_index,
)


def test_lifting_tables():
    assert len(ALL_LIFTING_SIZES) == 51
    assert min(ALL_LIFTING_SIZES) == 2 and max(ALL_LIFTING_SIZES) == 384
    for i, s in enumerate(LIFTING_SETS):
        for z in s:
            assert set_index(z) == i


def test_lifting_size_rule():
    # Z_c is the minimum Z over all sets with K_b * Z >= K'
    # (get_3gpp_lifting_size.m:7-12).
    assert lifting_size(22, 8448) == 384
    assert lifting_size(22, 22) == 2  # 22*2 = 44 >= 22 -> smallest Z is 2
    assert lifting_size(10, 100) == 10
    with pytest.raises(UnsupportedParameters):
        lifting_size(22, 22 * 384 + 1)


def test_base_graph_shapes():
    for bg, edges, rows, cols in ((1, 316, 46, 68), (2, 197, 42, 52)):
        for ils in range(8):
            r, c, s = base_graph(bg, ils)
            assert len(r) == edges
            assert r.max() == rows - 1 and c.max() == cols - 1
            assert s.min() >= 0


def test_tb_crc_selection():
    # A > 3824 -> CRC24A else CRC16 (NRLDPC.m:297-303).
    assert LDPCParams(BG=2, A=3824, G=11472, Q_m=2).tb_crc == "CRC16"
    # A=3825 has odd B' with C=2 (unsupported, like the reference); use 3826
    assert LDPCParams(BG=2, A=3826, G=11478, Q_m=2).tb_crc == "CRC24A"


def test_segmentation_single_block():
    p = LDPCParams(BG=1, A=1000, G=3000, Q_m=2)
    assert p.C == 1 and p.cb_crc == "None"
    assert p.B == 1016 and p.K_prime == 1016
    assert p.K_b == 22
    assert p.Z_c == lifting_size(22, 1016)
    assert p.K == 22 * p.Z_c and p.N == 66 * p.Z_c


def test_segmentation_multi_block():
    # B = 8448+24 > 8448 -> C = ceil(8472/8424) = 2, CB CRC24B appended.
    p = LDPCParams(BG=1, A=8448, G=25344, Q_m=2)
    assert p.tb_crc == "CRC24A" and p.C == 2 and p.cb_crc == "CRC24B"
    assert p.B_prime == p.B + 2 * 24
    assert p.K_prime * p.C == p.B_prime


def test_bg2_K_b_thresholds():
    # K_b = 10/9/8/6 by K' thresholds 640/560/192 (NRLDPC.m:385-406).
    def kb_for(A):
        G = 3 * A  # rate 1/3 keeps configs valid
        return LDPCParams(BG=2, A=A, G=G + (G % 2), Q_m=1).K_b

    assert kb_for(700) == 10
    assert kb_for(600) == 9
    assert kb_for(300) == 8
    assert kb_for(100) == 6


def test_E_r_split():
    # Sum of E_r must equal G; ceil/floor split per NRLDPC.m:485-507.
    p = LDPCParams(BG=2, A=3842, G=11526, Q_m=2)
    assert sum(p.E_r) == p.G
    assert p.E_r == (5762, 5764)
    assert all(e % p.Q_m == 0 for e in p.E_r)


def test_k0_table():
    # Table 5.4.2.1-2 start positions (NRLDPC.m:510-543).
    p = LDPCParams(BG=1, A=1000, G=3000, Q_m=2)
    Z, N = p.Z_c, p.N
    assert p.with_rv(0).k_0 == 0
    assert p.with_rv(1).k_0 == (17 * N) // (66 * Z) * Z
    assert p.with_rv(2).k_0 == (33 * N) // (66 * Z) * Z
    assert p.with_rv(3).k_0 == (56 * N) // (66 * Z) * Z


def test_lbrm():
    p = LDPCParams(BG=1, A=8448, G=25344, Q_m=2, I_LBRM=1, TBS_LBRM=8448)
    assert p.N_ref == (3 * 8448) // (2 * p.C)
    assert p.N_cb == min(p.N, p.N_ref)
    p2 = LDPCParams(BG=1, A=8448, G=25344, Q_m=2)
    assert p2.N_cb == p2.N


def test_cbgti():
    p = LDPCParams(BG=1, A=20004, G=60012, Q_m=2, CBGTI=(0, 2))
    assert p.C >= 3
    assert p.CBGTI_flags[0] == 0 and p.CBGTI_flags[2] == 0
    assert p.E_r[0] == 0 and p.E_r[2] == 0
    assert sum(p.E_r) == p.G


def test_invalid_params_raise():
    with pytest.raises(UnsupportedParameters):
        LDPCParams(BG=3, A=100, G=300, Q_m=2)
    with pytest.raises(UnsupportedParameters):
        LDPCParams(BG=1, A=100, G=301, Q_m=2)  # G not multiple of Q_m
    with pytest.raises(UnsupportedParameters):
        LDPCParams(BG=1, A=100, G=300, Q_m=3)
    with pytest.raises(UnsupportedParameters):
        LDPCParams(BG=1, A=100, G=300, Q_m=2, rv_id=4)


def test_filler_geometry():
    for bg in (1, 2):
        p = LDPCParams(BG=bg, A=1001, G=3004, Q_m=2)
        lo, hi = p.filler_range_d
        assert hi - lo == p.num_filler == p.K - p.K_prime
        assert lo == max(p.K_prime - 2 * p.Z_c, 0)
