"""Multi-host launch support.

The reference's multi-machine story is "start N MATLAB processes by hand with
different seeds and merge the text files" (plot_BLER_vs_SNR.m:23-27).  The
TPU-native equivalent: initialise the jax.distributed runtime so a pod slice
(or multi-host CPU ring) forms ONE mesh, then run the exact same MonteCarlo /
sweep code — the dp axis spans all processes' devices, psum rides ICI/DCN,
and per-device RNG folding makes every chip's stream distinct.

Typical pod-slice usage (one command per host, e.g. via gcloud/xpk):

    python -m ldpc_3gpp_tpu.parallel.launcher --coordinator HOST0:1234 \
        --num-processes 4 --process-id $WORKER_ID -- \
        python my_sweep.py

or programmatically:

    from ldpc_3gpp_tpu.parallel.launcher import init_distributed
    init_distributed()            # env-driven (TPU pods auto-detect)
    ...run sweeps as usual...

Only process 0 writes results files (``is_primary()``); counters are already
globally psum-reduced so every process sees identical totals.
"""
from __future__ import annotations

from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise jax.distributed; no-ops on a single-process setup.

    With no arguments, relies on the TPU pod auto-detection that
    jax.distributed.initialize performs from the environment.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
