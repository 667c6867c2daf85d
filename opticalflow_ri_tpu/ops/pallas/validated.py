"""Hardware-validated Pallas kernel registry.

CLAUDE.md's rule — "keep new Pallas kernels env-gated until proven on
hardware" — encoded in code after round 2 shipped an unproven kernel
default-ON and crashed half the bench grid (VERDICT.md round 2): a kernel
may appear in a DEFAULT dispatch path only when it is listed here, and each
listing names the hardware A/B stages in ``scripts/pallas_ab_results.json``
that prove it (a ``*_compiled`` parity stage + a timed stage).
``tests/test_pallas_kernels.py::test_validated_registry_matches_ab_artifact``
cross-checks every entry against the committed artifact, so a listing cannot
outlive (or precede) its measurement.

An unlisted kernel stays reachable via explicit ``impl=`` or the
measurement scripts — it just never dispatches by default.
"""

from __future__ import annotations

# kernel name -> (parity stage, timing stage) in scripts/pallas_ab_results.json
VALIDATED_KERNELS = {
    # Farneback updateMatrices tent-sample kernel (8.0x vs XLA @512^2)
    "um": ("um_pallas_compiled", "um_pallas"),
    # Farneback updateMatrices with data-dependent shift skipping (pl.when
    # branches away whole-band zero-weight shifts): LOSES on a static
    # converged-flow microbench (um_sparse_calibrated 0.40x — full-width
    # bands of the parabolic flow span most of the tent range) but wins
    # 1.86x on the full FB solve (um_sparse_fb_solve: 2.54 -> 1.37 ms
    # @512^2, bit-identical flows — the in-solve flow sequence skips most
    # of the 121-term contraction).  Dispatch prefers it over "um" inside
    # whole-solve traces; pin impl="pallas_dense" for static-flow callers.
    # Round 5 extended its residency envelope to 2048^2 (89.8 MB whole-R1
    # at band 16 fits the 100 MB scoped limit): um_sparse_2048_* stages —
    # 1.88x the channel-sparse kernel, full FB solve 22.7 -> 15.3 ms
    # (273 Mpix/s), parity 0.0/2.4e-6.  The DENSE whole kernel keeps the
    # 48 MB cap (value-carried accumulators OOM at 125.9 MB of 100 there).
    "um_sparse": ("um_sparse_compiled", "um_sparse_fb_solve"),
    # Farneback channel-blocked updateMatrices sampler for fields beyond
    # all-channel VMEM residency (19x vs XLA at 2048^2, flow parity 3.2e-6)
    "um_channel": ("um_channel_compiled", "um_channel"),
    # channel-blocked shift-skipping sampler: 1.35x the dense channel kernel
    # on the static stage and 1.22x the full 2048^2 FB solve (41.2 ->
    # 33.9 ms, bit-identical flows — um_channel_sparse_fb_solve)
    "um_channel_sparse": ("um_channel_sparse_compiled",
                          "um_channel_sparse_fb_solve"),
    # Farneback fused blur5+updateFlow kernel (1.44x)
    "blur5": ("blur5_pallas_compiled", "blur5_pallas"),
    # banded DMA-slab blur5+updateFlow for fields beyond whole-M residency
    # (bit-identical, 2.41x the XLA stencil blur @2048^2: 6.61 -> 2.74 ms)
    "blur5_banded": ("blur5_banded_compiled", "blur5_banded"),
    # blur5+updateFlow as a blocked banded MATMUL on the MXU (not a Pallas
    # kernel — ops/matmul_filter.py; registered here because this is the
    # dispatch-policy registry): 11.9x the banded DMA-slab kernel @2048^2
    # (2.93 -> 0.25 ms, block 256), full FB solve 31.7 -> 23.0 ms
    # (182.6 Mpix/s), flow parity 6.1e-6 (different f32 reduction order)
    "blur5_matmul": ("blur5_matmul_compiled", "blur5_matmul"),
    # polynomial expansion via stacked Toeplitz matmuls (round 5): each
    # input block loaded once against all kernels (4 HBM passes vs 9).
    # 1.27x the VPU chain at 2048^2 (1.55 -> 1.22 ms, parity 6.7e-6);
    # the earlier per-kernel matmul form measured only 1.07x.  Dispatch
    # floor 2048^2 — small pyramid levels stay on the fused VPU chain.
    "poly_matmul": ("poly_matmul_compiled", "poly_matmul"),
    # dense-LK banded Gauss-Newton kernel (2.27x)
    "lk_gn": ("lk_pallas_compiled", "lk_pallas"),
    # dense-LK band-resident ladder shift-plane build (bit-identical,
    # 1.37x the XLA ladder build end-to-end @512^2)
    "lk_build": ("lk_build_compiled", "lk_build_pallas"),
    # dense-LK stripe-staged build+GN for large images (bit-identical,
    # 2.57x the XLA-ladder-build path @2048^2: 30.3 ms, 138.5 Mpix/s —
    # only one stripe's plane stack ever exists in HBM)
    "lk_striped": ("lk_striped_compiled", "lk_striped_2048"),
    # per-gradient split build launches (band 256 instead of 128 at 2048^2
    # stripes): bit-identical, +1.6% (29.81 vs 30.27 ms) — the small gain
    # shows the build is base-window-sum-bound, not halo-recompute-bound
    # (plateau evidence: scripts/lk_stripe_sweep.json)
    "lk_build_split": ("lk_build_split_compiled", "lk_build_split_2048"),
    # driver warp as a sparse tent contraction (round 5): 9.8x XLA on
    # calibrated flows at 512^2 (0.145 vs 1.41 ms, parity 1.4e-7 rel),
    # 2.1x on wild |d/2|~7 flows.  The round-4 "kernel loses 2x" verdict
    # measured against a constant-folded XLA baseline — see
    # ops/pallas/warp_tent.py HISTORY.
    "warp_tent_sparse": ("warp_tent_sparse_compiled", "warp_tent_sparse"),
    # Horn-Schunck whole-solve VMEM-resident kernel (2.56x @512^2)
    "hs_whole": ("hs_whole_pallas_compiled", "hs_whole_pallas_512"),
    # Horn-Schunck temporal-blocked tiled kernel (4.45x @2048^2)
    "hs_tiled": ("hs_tiled_2048_compiled", "hs_tiled_2048"),
    # Liu-Shen whole-solve VMEM-resident kernel (bit-identical, ~parity
    # @512^2 — stays ON for guaranteed VMEM residency)
    "ls_whole": ("ls_whole_pallas_compiled", "ls_whole_pallas_512"),
    # Liu-Shen temporal-blocked tiled kernel (bit-identical, 1.61x @1024^2,
    # 3.83x @2048^2 — the round-2 SMEM-output lowering failure repaired and
    # hardware-proven)
    "ls_tiled": ("ls_tiled_2048_compiled", "ls_tiled_2048"),
}


def is_validated(kernel: str) -> bool:
    """True when ``kernel`` has committed hardware A/B evidence."""
    return kernel in VALIDATED_KERNELS
