// Native CPU MSM baseline + oracle for the tpu_msm framework.
//
// Role: the reference's CPU comparison harness (mopro-msm
// src/msm/arkworks_pippenger.rs — benchmark_msm/run_benchmark :7-75) and
// its fast host-side oracle, rebuilt in C++ (Rust is unavailable in this
// environment; SURVEY.md §2 notes the host layer maps to C++ where
// native). Implements BN254/BLS12-377-style short-Weierstrass MSM:
// 64-bit-limb Montgomery arithmetic (CIOS with __uint128_t), EFD
// Jacobian add-2007-bl / dbl-2009-l (the same formulas as
// shader/curve/jacobian.metal:11-100), signed-window Pippenger matching
// the device pipeline's digit semantics
// (convert_point_coords_and_decompose_scalars.metal:94-121), threaded
// over windows.
//
// Curve constants arrive from a generated header (params_gen.h) written
// by tpu_msm/host/cpu_msm.py — the analogue of the reference's constants
// codegen (metal_msm/host/shader.rs:37-178).
//
// Exposed C ABI (ctypes):
//   int cpu_msm(curve_id, xs, ys, scalars, n, window, nthreads, out12)
//     xs/ys: n * NW u64 little-endian standard-form affine coordinates
//     scalars: n * SW u64
//     out12: Jacobian (x, y, z) standard form, NW u64 each
//   int cpu_msm_mont_throughput(...)  — microbench helper

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include "params_gen.h"

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

template <int NW>
struct Fp {
  u64 v[NW];
};

template <int NW>
struct CurveCtx {
  u64 p[NW];
  u64 n0;        // -p^{-1} mod 2^64
  u64 r2[NW];    // R^2 mod p, R = 2^(64*NW)
  u64 one_m[NW]; // R mod p (1 in Montgomery form)
  u64 b_mont[NW];
  int scalar_words;
  int scalar_bits;
};

template <int NW>
inline bool gte(const u64* a, const u64* b) {
  for (int i = NW - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

template <int NW>
inline void sub_nocheck(u64* r, const u64* a, const u64* b) {
  u128 borrow = 0;
  for (int i = 0; i < NW; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    r[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

template <int NW>
inline void ff_add(const CurveCtx<NW>& C, u64* r, const u64* a, const u64* b) {
  u128 carry = 0;
  u64 t[NW];
  for (int i = 0; i < NW; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    t[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || gte<NW>(t, C.p)) {
    sub_nocheck<NW>(r, t, C.p);
  } else {
    std::memcpy(r, t, sizeof(t));
  }
}

template <int NW>
inline void ff_sub(const CurveCtx<NW>& C, u64* r, const u64* a, const u64* b) {
  if (gte<NW>(a, b)) {
    sub_nocheck<NW>(r, a, b);
  } else {
    u64 t[NW];
    u128 carry = 0;
    for (int i = 0; i < NW; ++i) {
      u128 s = (u128)a[i] + C.p[i] + carry;
      t[i] = (u64)s;
      carry = s >> 64;
    }
    sub_nocheck<NW>(r, t, b);
  }
}

// CIOS Montgomery multiply, 64-bit words (the 64-bit analogue of
// shader/mont_backend/mont.metal mont_mul_cios :105-181).
template <int NW>
inline void mont_mul(const CurveCtx<NW>& C, u64* r, const u64* a, const u64* b) {
  u64 t[NW + 2];
  std::memset(t, 0, sizeof(t));
  for (int i = 0; i < NW; ++i) {
    u128 carry = 0;
    for (int j = 0; j < NW; ++j) {
      u128 cs = (u128)a[j] * b[i] + t[j] + carry;
      t[j] = (u64)cs;
      carry = cs >> 64;
    }
    u128 cs = (u128)t[NW] + carry;
    t[NW] = (u64)cs;
    t[NW + 1] = (u64)(cs >> 64);

    u64 m = t[0] * C.n0;
    carry = ((u128)m * C.p[0] + t[0]) >> 64;
    for (int j = 1; j < NW; ++j) {
      u128 cs2 = (u128)m * C.p[j] + t[j] + carry;
      t[j - 1] = (u64)cs2;
      carry = cs2 >> 64;
    }
    cs = (u128)t[NW] + carry;
    t[NW - 1] = (u64)cs;
    t[NW] = t[NW + 1] + (u64)(cs >> 64);
    t[NW + 1] = 0;
  }
  if (t[NW] || gte<NW>(t, C.p)) {
    sub_nocheck<NW>(r, t, C.p);
  } else {
    std::memcpy(r, t, NW * sizeof(u64));
  }
}

template <int NW>
struct Jac {
  u64 x[NW], y[NW], z[NW];
};

template <int NW>
inline bool is_zero(const u64* a) {
  for (int i = 0; i < NW; ++i)
    if (a[i]) return false;
  return true;
}

template <int NW>
inline bool eq(const u64* a, const u64* b) {
  return std::memcmp(a, b, NW * sizeof(u64)) == 0;
}

// dbl-2009-l (jacobian.metal:11-44)
template <int NW>
void jac_dbl(const CurveCtx<NW>& C, Jac<NW>& out, const Jac<NW>& p) {
  if (is_zero<NW>(p.z)) { out = p; return; }
  Jac<NW> r;  // local result: callers alias out with p (e.g. Horner)
  u64 a[NW], b[NW], c[NW], d[NW], e[NW], f[NW], t[NW], t2[NW];
  mont_mul<NW>(C, a, p.x, p.x);
  mont_mul<NW>(C, b, p.y, p.y);
  mont_mul<NW>(C, c, b, b);
  ff_add<NW>(C, t, p.x, b);
  mont_mul<NW>(C, t, t, t);
  ff_sub<NW>(C, t, t, a);
  ff_sub<NW>(C, t, t, c);
  ff_add<NW>(C, d, t, t);
  ff_add<NW>(C, e, a, a);
  ff_add<NW>(C, e, e, a);
  mont_mul<NW>(C, f, e, e);
  ff_add<NW>(C, t, d, d);
  ff_sub<NW>(C, r.x, f, t);
  ff_add<NW>(C, t2, c, c);
  ff_add<NW>(C, t2, t2, t2);
  ff_add<NW>(C, t2, t2, t2);
  ff_sub<NW>(C, t, d, r.x);
  mont_mul<NW>(C, t, e, t);
  ff_sub<NW>(C, r.y, t, t2);
  ff_add<NW>(C, t, p.y, p.y);
  mont_mul<NW>(C, r.z, t, p.z);
  out = r;
}

// add-2007-bl with zero/equal shortcuts (jacobian.metal:46-100)
template <int NW>
void jac_add(const CurveCtx<NW>& C, Jac<NW>& out, const Jac<NW>& p,
             const Jac<NW>& q) {
  if (is_zero<NW>(p.z)) { out = q; return; }
  if (is_zero<NW>(q.z)) { out = p; return; }
  Jac<NW> r;  // local result: callers alias out with p (running sums)
  u64 z1z1[NW], z2z2[NW], u1[NW], u2[NW], s1[NW], s2[NW];
  mont_mul<NW>(C, z1z1, p.z, p.z);
  mont_mul<NW>(C, z2z2, q.z, q.z);
  mont_mul<NW>(C, u1, p.x, z2z2);
  mont_mul<NW>(C, u2, q.x, z1z1);
  mont_mul<NW>(C, s1, p.y, q.z);
  mont_mul<NW>(C, s1, s1, z2z2);
  mont_mul<NW>(C, s2, q.y, p.z);
  mont_mul<NW>(C, s2, s2, z1z1);
  if (eq<NW>(u1, u2)) {
    if (eq<NW>(s1, s2)) { jac_dbl<NW>(C, out, p); return; }
    std::memset(&out, 0, sizeof(out));
    return;
  }
  u64 h[NW], i[NW], j[NW], rr[NW], v[NW], t[NW], t2[NW];
  ff_sub<NW>(C, h, u2, u1);
  ff_add<NW>(C, t, h, h);
  mont_mul<NW>(C, i, t, t);
  mont_mul<NW>(C, j, h, i);
  ff_sub<NW>(C, rr, s2, s1);
  ff_add<NW>(C, rr, rr, rr);
  mont_mul<NW>(C, v, u1, i);
  mont_mul<NW>(C, t, rr, rr);
  ff_sub<NW>(C, t, t, j);
  ff_add<NW>(C, t2, v, v);
  ff_sub<NW>(C, r.x, t, t2);
  ff_sub<NW>(C, t, v, r.x);
  mont_mul<NW>(C, t, rr, t);
  mont_mul<NW>(C, t2, s1, j);
  ff_add<NW>(C, t2, t2, t2);
  ff_sub<NW>(C, r.y, t, t2);
  ff_add<NW>(C, t, p.z, q.z);
  mont_mul<NW>(C, t, t, t);
  ff_sub<NW>(C, t, t, z1z1);
  ff_sub<NW>(C, t, t, z2z2);
  mont_mul<NW>(C, r.z, t, h);
  out = r;
}

// Signed-window Pippenger over one window range [w_lo, w_hi) — the same
// bucket semantics as the device pipeline (smvp.metal:46-105 fold +
// pbpr.metal m/g running sums).
template <int NW>
void msm_windows(const CurveCtx<NW>& C, const u64* xs, const u64* ys,
                 const u64* scalars, size_t n, int window, int w_lo,
                 int w_hi, int num_windows, Jac<NW>* out) {
  const int B = 1 << (window - 1);
  std::vector<Jac<NW>> buckets(B);
  for (int w = w_lo; w < w_hi; ++w) {
    std::memset(buckets.data(), 0, buckets.size() * sizeof(Jac<NW>));
    for (size_t idx = 0; idx < n; ++idx) {
      // extract signed digit w of scalar idx, rebuilding the carry chain
      // from window 0 (simple and cache-friendly; digit extraction is a
      // tiny fraction of the bucket-add cost)
      const u64* sc = scalars + idx * C.scalar_words;
      // compute digit w with carry from windows < w
      u64 carry = 0;
      long long digit = 0;
      for (int ww = 0; ww <= w; ++ww) {
        int bit = ww * window;
        int word = bit >> 6, off = bit & 63;
        u64 raw = sc[word] >> off;
        if (off && word + 1 < C.scalar_words)
          raw |= sc[word + 1] << (64 - off);
        raw &= (1ull << window) - 1;
        raw += carry;
        if (raw >= (1ull << (window - 1))) {
          digit = (long long)raw - (1ll << window);
          carry = 1;
        } else {
          digit = (long long)raw;
          carry = 0;
        }
      }
      if (digit == 0) continue;
      int b = (int)(digit > 0 ? digit : -digit) - 1;
      Jac<NW> pt;
      std::memcpy(pt.x, xs + idx * NW, NW * sizeof(u64));
      if (digit > 0) {
        std::memcpy(pt.y, ys + idx * NW, NW * sizeof(u64));
      } else {
        // -y mod p
        if (is_zero<NW>(ys + idx * NW))
          std::memcpy(pt.y, ys + idx * NW, NW * sizeof(u64));
        else
          sub_nocheck<NW>(pt.y, C.p, ys + idx * NW);
      }
      std::memcpy(pt.z, C.one_m, NW * sizeof(u64));
      jac_add<NW>(C, buckets[b], buckets[b], pt);
    }
    // running-sum reduction (pbpr m/g)
    Jac<NW> m, g;
    std::memset(&m, 0, sizeof(m));
    std::memset(&g, 0, sizeof(g));
    for (int b = B - 1; b >= 0; --b) {
      jac_add<NW>(C, m, m, buckets[b]);
      jac_add<NW>(C, g, g, m);
    }
    out[w] = g;
  }
}

template <int NW>
int msm_impl(const CurveCtx<NW>& C, const u64* xs_std, const u64* ys_std,
             const u64* scalars, size_t n, int window, int nthreads,
             u64* out) {
  const int num_windows = (C.scalar_bits + window - 1) / window;
  // Montgomery-encode coordinates once
  std::vector<u64> xs(n * NW), ys(n * NW);
  for (size_t i = 0; i < n; ++i) {
    mont_mul<NW>(C, &xs[i * NW], xs_std + i * NW, C.r2);
    mont_mul<NW>(C, &ys[i * NW], ys_std + i * NW, C.r2);
  }
  std::vector<Jac<NW>> windows(num_windows);
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads < 1) nthreads = 1;
  if (nthreads > num_windows) nthreads = num_windows;
  std::vector<std::thread> pool;
  int per = (num_windows + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int lo = t * per, hi = std::min(num_windows, lo + per);
    if (lo >= hi) break;
    pool.emplace_back([&, lo, hi] {
      msm_windows<NW>(C, xs.data(), ys.data(), scalars, n, window, lo, hi,
                      num_windows, windows.data());
    });
  }
  for (auto& th : pool) th.join();

  // Horner over windows (metal_msm.rs:250-258)
  Jac<NW> acc;
  std::memset(&acc, 0, sizeof(acc));
  for (int w = num_windows - 1; w >= 0; --w) {
    for (int d = 0; d < window; ++d) jac_dbl<NW>(C, acc, acc);
    jac_add<NW>(C, acc, acc, windows[w]);
  }
  // Montgomery-decode (mul by 1)
  u64 onev[NW];
  std::memset(onev, 0, sizeof(onev));
  onev[0] = 1;
  mont_mul<NW>(C, out, acc.x, onev);
  mont_mul<NW>(C, out + NW, acc.y, onev);
  mont_mul<NW>(C, out + 2 * NW, acc.z, onev);
  return 0;
}

CurveCtx<BN254_NW> g_bn254;
CurveCtx<BLS377_NW> g_bls377;
bool g_init = false;

void init_ctx() {
  if (g_init) return;
  std::memcpy(g_bn254.p, BN254_P, sizeof(BN254_P));
  g_bn254.n0 = BN254_N0;
  std::memcpy(g_bn254.r2, BN254_R2, sizeof(BN254_R2));
  std::memcpy(g_bn254.one_m, BN254_ONE, sizeof(BN254_ONE));
  g_bn254.scalar_words = BN254_SCALAR_WORDS;
  g_bn254.scalar_bits = BN254_SCALAR_BITS;
  std::memcpy(g_bls377.p, BLS377_P, sizeof(BLS377_P));
  g_bls377.n0 = BLS377_N0;
  std::memcpy(g_bls377.r2, BLS377_R2, sizeof(BLS377_R2));
  std::memcpy(g_bls377.one_m, BLS377_ONE, sizeof(BLS377_ONE));
  g_bls377.scalar_words = BLS377_SCALAR_WORDS;
  g_bls377.scalar_bits = BLS377_SCALAR_BITS;
  g_init = true;
}

}  // namespace

extern "C" {

int cpu_msm(int curve_id, const u64* xs, const u64* ys, const u64* scalars,
            size_t n, int window, int nthreads, u64* out) {
  init_ctx();
  if (n == 0 || window < 2 || window > 31) return 1;
  if (curve_id == 0)
    return msm_impl<BN254_NW>(g_bn254, xs, ys, scalars, n, window, nthreads, out);
  if (curve_id == 1)
    return msm_impl<BLS377_NW>(g_bls377, xs, ys, scalars, n, window, nthreads, out);
  return 2;
}

// Montgomery-multiply throughput microbench (the analogue of the
// reference's mont_benchmarks cost-loop shaders) — returns muls/sec.
double cpu_mont_throughput(int curve_id, long long iters) {
  init_ctx();
  if (curve_id != 0) return -1.0;
  u64 a[BN254_NW], b[BN254_NW];
  std::memcpy(a, BN254_R2, sizeof(a));
  std::memcpy(b, BN254_ONE, sizeof(b));
  auto t0 = std::chrono::steady_clock::now();
  for (long long i = 0; i < iters; ++i) {
    mont_mul<BN254_NW>(g_bn254, a, a, b);
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  volatile u64 sink = a[0];
  (void)sink;
  return iters / secs;
}

}  // extern "C"
