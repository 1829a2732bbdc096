#!/usr/bin/env python3
"""Extract the TS38.212 base-graph shift tables from the reference MATLAB source.

The tables in /root/reference/get_3gpp_base_graph.m are verbatim transcriptions of
3GPP TS38.212 Tables 5.3.2-2 (BG1) and 5.3.2-3 (BG2): each line is
``row col shift_iLS0 ... shift_iLS7``.  They are standards *data*, not code, so we
parse them out of the reference file and emit a compact .npz consumed by
ldpc_3gpp_tpu.spec.tables.

Run:  python tools/extract_tables.py
"""
import re
import numpy as np
import os

REF = "/root/reference/get_3gpp_base_graph.m"
OUT = os.path.join(os.path.dirname(__file__), "..", "ldpc_3gpp_tpu", "spec", "base_graphs.npz")


def main():
    with open(REF) as f:
        text = f.read()

    # Two matrix literals: table{1} = [ ... ]; table{2} = [ ... ];
    blocks = re.findall(r"table\{(\d)\}\s*=\s*\[(.*?)\];", text, re.S)
    assert len(blocks) == 2, f"expected 2 tables, found {len(blocks)}"

    out = {}
    for idx, body in blocks:
        rows = []
        for line in body.strip().splitlines():
            line = line.strip()
            if not line:
                continue
            vals = [int(v) for v in line.split()]
            assert len(vals) == 10, f"bad line: {line}"
            rows.append(vals)
        arr = np.array(rows, dtype=np.int32)
        bg = int(idx)
        out[f"bg{bg}_row"] = arr[:, 0]
        out[f"bg{bg}_col"] = arr[:, 1]
        out[f"bg{bg}_shift"] = arr[:, 2:]  # (E, 8) one column per i_LS

    # Sanity: BG1 = 316 edges over 46x68, BG2 = 197 edges over 42x52
    assert out["bg1_row"].shape[0] == 316, out["bg1_row"].shape
    assert out["bg2_row"].shape[0] == 197, out["bg2_row"].shape
    assert out["bg1_row"].max() == 45 and out["bg1_col"].max() == 67
    assert out["bg2_row"].max() == 41 and out["bg2_col"].max() == 51

    np.savez_compressed(os.path.abspath(OUT), **out)
    print(f"wrote {os.path.abspath(OUT)}")
    for k, v in out.items():
        print(f"  {k}: shape={v.shape}")


if __name__ == "__main__":
    main()
