"""Host sim: sort 512k random walkers by cell at t=0; measure run
fragmentation (distinct cell-runs per 128-tile and DMA rows per spin)
after j un-resorted steps, for cell widths w (in step units)."""
import numpy as np

rng = np.random.RandomState(0)
N = 1 << 19
VOX = 81.0  # voxel width in steps (32um / 0.395um)

def dirs(n):
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    rho = np.sqrt(1 - z * z)
    return np.stack([rho * np.cos(phi), rho * np.sin(phi), z], 1)

for w in (2.0, 3.0, 4.26):
    n_sv = int(VOX / w)
    sw = VOX / n_sv
    r = rng.uniform(0, VOX, (N, 3))
    def cells(r):
        c = np.floor(r / sw).astype(int) % n_sv
        return (c[:, 0] * n_sv + c[:, 1]) * n_sv + c[:, 2]
    order = np.argsort(cells(r), kind="stable")
    r = r[order]
    print(f"w={w} n_sv={n_sv}:")
    for j in range(13):
        c = cells(r)
        # runs per 128-tile: count boundaries
        b = np.concatenate(([True], c[1:] != c[:-1]))
        runs_per_tile = b.reshape(-1, 128).sum(1).mean()
        # masked MT passes per 32-block ~ distinct runs overlapping block
        blocks = b.reshape(-1, 32)
        passes = (blocks.sum(1) + 1).mean()  # runs starting in block + carry-in
        if j in (0, 1, 2, 4, 6, 8, 10, 12):
            print(f"  j={j:2d}: runs/128-tile={runs_per_tile:6.1f}  MTpasses/32block~{passes:5.2f}")
        r = r + dirs(N)
