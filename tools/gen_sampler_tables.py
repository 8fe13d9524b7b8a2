"""Offline generation of sampler tables (run once; outputs committed).

The reference imports pmj02 sample tables and blue-noise textures from
pbrt-v4-derived files that are absent from its snapshot (pmj02bn.py:1-2;
SURVEY.md). This regenerates equivalents from first principles:

  * Sample sets: Owen-scrambled Sobol' (0,2)-sequence points, one scramble
    per set. A (0,2)-sequence gives every prefix of size 2^k stratification
    over all elementary intervals — the same progressive property pmj02
    tables are built for (and the reason pbrt calls them interchangeable for
    the first two dimensions).
  * Blue-noise textures: void-and-cluster (Ulichney) on a 128x128 torus,
    used for per-pixel Cranley-Patterson rotations.

Output: zdr_tpu/samplers/tables.npz
  pmj02:     (N_SETS, N_SAMPLES, 2) float32 in [0,1)
  bluenoise: (N_TEX, RES, RES) float32 in [0,1)
"""

import os

import numpy as np

N_SETS = 5  # reference pmj02bn.py:10 (nPMJ02bnSets)
N_SAMPLES = 65536  # nPMJ02bnSamples
BN_RES = 128  # BlueNoiseResolution
N_BN_TEX = 16  # reference uses 48; 16 keeps the repo small (indexed mod N)


# ----------------------------------------------------- sobol (0,2) + owen


def _vdc(idx: np.ndarray) -> np.ndarray:
    """Van der Corput radical inverse in base 2 (bit reversal), uint32."""
    v = idx.astype(np.uint32)
    v = ((v >> 16) | (v << 16)) & 0xFFFFFFFF
    v = ((v & 0x00FF00FF) << 8) | ((v & 0xFF00FF00) >> 8)
    v = ((v & 0x0F0F0F0F) << 4) | ((v & 0xF0F0F0F0) >> 4)
    v = ((v & 0x33333333) << 2) | ((v & 0xCCCCCCCC) >> 2)
    v = ((v & 0x55555555) << 1) | ((v & 0xAAAAAAAA) >> 1)
    return v.astype(np.uint32)


def _sobol_dim2(idx: np.ndarray) -> np.ndarray:
    """Second Sobol' dimension (direction numbers for the x^1+x primitive
    polynomial), vectorized over uint32 indices."""
    # direction vectors: m_1 = 1, m_k = m_{k-1} ^ (2 m_{k-1}) gives the
    # classic dim-2 sequence 1, 3, 5, 15, 17, 51, 85, 255, ...
    v = np.zeros(32, dtype=np.uint32)
    mk = [1]
    for k in range(1, 32):
        mk.append(mk[k - 1] ^ (2 * mk[k - 1]))
    for k in range(32):
        v[k] = np.uint32((mk[k] << (31 - k)) & 0xFFFFFFFF)
    out = np.zeros_like(idx, dtype=np.uint32)
    i = idx.astype(np.uint64)
    for k in range(32):
        bit = ((i >> np.uint64(k)) & np.uint64(1)).astype(bool)
        out = np.where(bit, out ^ v[k], out)
    return out.astype(np.uint32)


def _owen_scramble(x: np.ndarray, seed: np.uint32) -> np.ndarray:
    """Laine-Karras style nested uniform scramble (operates on reversed
    bits), vectorized uint32."""
    v = _vdc(x)  # reverse bits
    v = (v + seed).astype(np.uint32)
    v = (v ^ (v * np.uint32(0x6C50B47C))).astype(np.uint32)
    v = (v ^ (v * np.uint32(0xB82F1E52))).astype(np.uint32)
    v = (v ^ (v * np.uint32(0xC7AFE638))).astype(np.uint32)
    v = (v ^ (v * np.uint32(0x8D22F6E6))).astype(np.uint32)
    return _vdc(v)  # reverse back


def gen_pmj02_sets() -> np.ndarray:
    idx = np.arange(N_SAMPLES, dtype=np.uint32)
    out = np.empty((N_SETS, N_SAMPLES, 2), dtype=np.float32)
    rng = np.random.RandomState(1234)
    for s in range(N_SETS):
        seed_x = np.uint32(rng.randint(0, 2**31))
        seed_y = np.uint32(rng.randint(0, 2**31))
        x = _owen_scramble(_vdc(idx), seed_x)
        y = _owen_scramble(_sobol_dim2(idx), seed_y)
        out[s, :, 0] = x.astype(np.float64) / 2**32
        out[s, :, 1] = y.astype(np.float64) / 2**32
    return out


# ----------------------------------------------------- blue noise (V&C)


def _wrapped_gaussian_kernel(n: int, sigma: float = 1.9) -> np.ndarray:
    ax = np.arange(n)
    d = np.minimum(ax, n - ax).astype(np.float64)
    dx, dy = np.meshgrid(d, d)
    return np.exp(-(dx**2 + dy**2) / (2 * sigma**2))


def gen_bluenoise(res: int = BN_RES, n_tex: int = N_BN_TEX) -> np.ndarray:
    """Void-and-cluster rank textures, values uniform in [0,1)."""
    kernel = _wrapped_gaussian_kernel(res)
    kf = np.fft.rfft2(kernel)

    def energy(binary):
        return np.fft.irfft2(np.fft.rfft2(binary) * kf, s=binary.shape)

    out = np.empty((n_tex, res, res), dtype=np.float32)
    rng = np.random.RandomState(99)
    npx = res * res
    for t in range(n_tex):
        # initial pattern: 10% ones, relaxed to the stable V&C prototype
        binary = np.zeros((res, res), bool)
        ones = rng.choice(npx, npx // 10, replace=False)
        binary.flat[ones] = True
        e = energy(binary.astype(np.float64))
        for _ in range(npx):  # bounded relaxation
            cluster = np.argmax(np.where(binary, e, -np.inf))
            binary.flat[cluster] = False
            e2 = energy(binary.astype(np.float64))
            void = np.argmin(np.where(binary, np.inf, e2).ravel())
            binary.flat[void] = True
            if void == cluster:
                break
            e = energy(binary.astype(np.float64))
        rank = np.zeros(npx, np.int64)
        # phase 1: remove tightest cluster, rank descending
        b1 = binary.copy()
        e = energy(b1.astype(np.float64))
        n_ones = int(b1.sum())
        for r in range(n_ones - 1, -1, -1):
            cluster = np.argmax(np.where(b1, e, -np.inf))
            b1.flat[cluster] = False
            rank[cluster] = r
            e = energy(b1.astype(np.float64))
        # phase 2+3: fill largest void, rank ascending
        b2 = binary.copy()
        e = energy(b2.astype(np.float64))
        for r in range(n_ones, npx):
            void = np.argmin(np.where(b2, np.inf, e).ravel())
            b2.flat[void] = True
            rank[void] = r
            e = energy(b2.astype(np.float64))
        out[t] = (rank.reshape(res, res).astype(np.float64) / npx).astype(
            np.float32
        )
        print(f"bluenoise texture {t+1}/{n_tex} done")
    return out


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(here, "..", "zdr_tpu", "samplers", "tables.npz")
    pmj = gen_pmj02_sets()
    print("pmj02 sets:", pmj.shape)
    bn = gen_bluenoise()
    np.savez_compressed(dst, pmj02=pmj, bluenoise=bn)
    print("wrote", dst)


if __name__ == "__main__":
    main()
