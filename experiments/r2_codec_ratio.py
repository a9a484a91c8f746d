"""Compression-ratio study: bucket-Huffman (.tpc v1) vs fixed-width
per-chain packing variants, on the synthetic bench terrain.

Candidate v2 layouts (all gather/ladder-free to decode):
  A. per-chain per-component fixed width = max bucket in chain
  B. A + exception patching: width = P99 bucket, exceptions side-stream
  C. per-chain single width for all 3 components
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud
from pcrhpg24_tpu.codec.morton import morton_order
from pcrhpg24_tpu.codec.batch_codec import chain_deltas
from pcrhpg24_tpu.codec.native import zigzag, _bitlen, encode_native_batch

n = 16 * 65536
xyz, rgb = terrain_cloud(n, seed=1, extent=2000.0)
grid = cloud_to_grid(xyz, scale=(0.001, 0.001, 0.001)).astype(np.int64)
order = morton_order(grid[:, 0], grid[:, 1], grid[:, 2])
grid = grid[order]

tot_v1 = tot_A = tot_B = tot_C = 0
tot_excA = 0
for b in range(16):
    g = grid[b * 65536 : (b + 1) * 65536]
    deltas, starts = chain_deltas(g[:, 0], g[:, 1], g[:, 2])  # (1024,192)
    zz = zigzag(deltas)
    buckets = _bitlen(zz).reshape(1024, 64, 3)  # bucket b => b-1 extra bits

    nb = encode_native_batch(g[:, 0], g[:, 1], g[:, 2])
    tot_v1 += nb.total_words * 4

    # bits per symbol of bucket b under fixed width w: w bits (stores the
    # zigzag value in w bits; representable iff b <= w)
    per_comp_max = buckets.max(axis=1)  # (1024, 3)
    tot_A += int(per_comp_max.sum() * 64 // 8)

    # B: width = 99th pct bucket; exceptions cost ~ (6b pos + 32b value)
    w99 = np.percentile(buckets, 99, axis=1).astype(np.int64)  # (1024,3)
    nexc = (buckets > w99[:, None, :]).sum()
    tot_B += int(w99.sum() * 64 // 8) + int(nexc) * 5
    tot_excA += int(nexc)

    tot_C += int(buckets.max(axis=(1, 2)).sum() * 3 * 64 // 8)

raw = n * 12
print(f"raw 12B/pt geometry: {raw/1e6:.2f} MB")
for name, t in [("v1 bucket-huffman", tot_v1), ("A fixed max-width", tot_A),
                ("B fixed p99+exc", tot_B), ("C single width", tot_C)]:
    print(f"{name:20s}: {t/1e6:8.2f} MB  ratio {raw/t:5.2f}x  bits/pt {t*8/n:5.1f}")
print(f"exceptions under B: {tot_excA} ({tot_excA/ (n*3) *100:.2f}% of symbols)")
# distribution of chain max buckets
deltas, _ = chain_deltas(grid[:65536, 0], grid[:65536, 1], grid[:65536, 2])
bk = _bitlen(zigzag(deltas)).reshape(1024, 64, 3)
print("chain max-bucket histogram (x):", np.bincount(bk.max(axis=1)[:, 0]))
print("all-bucket histogram:", np.bincount(bk.reshape(-1))[:24])
