"""RULED OUT: full-key (pid, depth, payload) row sort to drop the
in-kernel suffix-min.

Hypothesis: the merge kernel's segmented suffix-min exists because rows
are sorted by pid only (nk1); sorting by the FULL key makes the first
entry of every run its exact u64 min, so the kernel can run with
suffix_steps=0 and the lax.cond'd _runs_bounded device check vanishes.

Sort-cost menu on (128, 32768) u32 rows (device-trace timed; realistic
half-sentinel pid rows):

    num_keys=1 (production nk1)       1.58 ms
    num_keys=2                        1.75 ms
    num_keys=3 (full key)             2.14 ms
    [pid, u64(dep<<32|pay)] 2-key     2.95 ms (x64-enabled, real u64)
    (u32-truncated "u64" control      1.30 ms — JAX silently
     canonicalizes uint64 -> uint32 without jax_enable_x64; a trap)

Measured end-to-end after wiring num_keys=3 + fully_sorted=True through
the flagship (lesion split, 4.2M/orbit):

    phase     nk1 (prod)   full-key
    sort         1.63        2.19
    table        1.58        1.58
    kernel       3.20        3.17   <- suffix-min removal saved NOTHING
    bench orbit  7.30        7.57 ms

Verdict: the suffix-min's ~1.5 ms of vreg ops (r3_kernel_floor) is
LATENCY-HIDDEN: the ILP_WIDE=2 interleave already overlaps it with the
probe chain's serial gather latencies, so removing the ops does not
shorten the critical path — the kernel is latency-bound, not
throughput-bound.  The +0.56 ms 3-key sort buys nothing.  A follow-up
ILP/RING sweep on the suffix-free kernel (FS=1 r3_ilp_sweep.py) shows
wide=2/ring=6 still optimal (3.95 ms) and wider interleaves WORSE
(4.04-4.22) — vreg pressure, not missing parallelism, binds.

Production stays nk1 + FAST_SUFFIX_STEPS.  Consequence for future
attacks: only cuts to the probe chain's serial latency (or to window
count) can shrink this kernel; removing parallel-schedulable vreg work
will not.
"""
print(__doc__)
