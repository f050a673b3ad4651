// Montgomery modular exponentiation on 64-bit limbs.
//
// Stands in for the reference's GMP dependency (ncw/gmp, imported at
// db.go:8 etc.): every Paillier ciphertext operation bottoms out in
// modexp. CIOS Montgomery multiplication with __uint128_t products and a
// fixed 4-bit window; odd moduli only (Paillier moduli N^k are odd).
//
// Build: g++ -O3 -shared -fPIC bigmod.cpp -o libbigmod.so

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;

extern "C" {

// n0inv = -mod[0]^-1 mod 2^64
static uint64_t inv64(uint64_t a) {
  uint64_t x = 1;
  for (int i = 0; i < 6; i++) x *= 2 - a * x;  // Newton, a odd
  return (uint64_t)(0 - x);
}

// CIOS Montgomery multiply: out = a*b*R^-1 mod m (R = 2^(64n))
static void mont_mul(const uint64_t* a, const uint64_t* b, const uint64_t* m,
                     uint64_t n0inv, size_t n, uint64_t* out, uint64_t* t) {
  memset(t, 0, (n + 2) * 8);
  for (size_t i = 0; i < n; i++) {
    // t += a[i] * b
    uint64_t carry = 0;
    for (size_t j = 0; j < n; j++) {
      u128 cur = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (uint64_t)cur;
      carry = (uint64_t)(cur >> 64);
    }
    u128 cur = (u128)t[n] + carry;
    t[n] = (uint64_t)cur;
    t[n + 1] = (uint64_t)(cur >> 64);
    // reduce
    uint64_t mfac = t[0] * n0inv;
    carry = 0;
    {
      u128 c0 = (u128)mfac * m[0] + t[0];
      carry = (uint64_t)(c0 >> 64);
    }
    for (size_t j = 1; j < n; j++) {
      u128 c = (u128)mfac * m[j] + t[j] + carry;
      t[j - 1] = (uint64_t)c;
      carry = (uint64_t)(c >> 64);
    }
    u128 c = (u128)t[n] + carry;
    t[n - 1] = (uint64_t)c;
    t[n] = t[n + 1] + (uint64_t)(c >> 64);
    t[n + 1] = 0;
  }
  // conditional subtract
  uint64_t borrow = 0;
  std::vector<uint64_t> sub(n);
  for (size_t j = 0; j < n; j++) {
    u128 d = (u128)t[j] - m[j] - borrow;
    sub[j] = (uint64_t)d;
    borrow = (uint64_t)((d >> 64) & 1);
  }
  bool take_sub = t[n] != 0 || !borrow;
  for (size_t j = 0; j < n; j++) out[j] = take_sub ? sub[j] : t[j];
}

// out = base^exp mod m. All little-endian u64 limb arrays; m odd, n limbs;
// base < m; exp has exp_n limbs.
void mg_powmod(const uint64_t* base, const uint64_t* exp, size_t exp_n,
               const uint64_t* m, size_t n, uint64_t* out) {
  uint64_t n0inv = inv64(m[0]);
  std::vector<uint64_t> t(n + 2);

  // R mod m and R^2 mod m via doubling (simple, done once per call)
  std::vector<uint64_t> r(n, 0), r2(n, 0);
  // r = R mod m: start with 2^(64n-1) mod m built by doubling 1, 64n times
  std::vector<uint64_t> cur(n, 0);
  cur[0] = 1;
  auto dbl = [&](std::vector<uint64_t>& x) {
    uint64_t carry = 0;
    for (size_t j = 0; j < n; j++) {
      uint64_t nx = (x[j] << 1) | carry;
      carry = x[j] >> 63;
      x[j] = nx;
    }
    // subtract m if >= m (or if overflowed)
    uint64_t borrow = 0;
    std::vector<uint64_t> sub(n);
    for (size_t j = 0; j < n; j++) {
      u128 d = (u128)x[j] - m[j] - borrow;
      sub[j] = (uint64_t)d;
      borrow = (uint64_t)((d >> 64) & 1);
    }
    if (carry || !borrow) x = sub;
  };
  for (size_t i = 0; i < 64 * n; i++) dbl(cur);
  r = cur;  // R mod m
  for (size_t i = 0; i < 64 * n; i++) dbl(cur);
  r2 = cur;  // R^2 mod m

  // base in Montgomery form
  std::vector<uint64_t> bm(n);
  mont_mul(base, r2.data(), m, n0inv, n, bm.data(), t.data());

  // 4-bit window table: w[k] = base^k in Montgomery form
  std::vector<uint64_t> table(16 * n);
  memcpy(table.data(), r.data(), n * 8);  // base^0 = 1 (Mont form = R)
  memcpy(table.data() + n, bm.data(), n * 8);
  for (int k = 2; k < 16; k++)
    mont_mul(table.data() + (k - 1) * n, bm.data(), m, n0inv, n,
             table.data() + k * n, t.data());

  // find top nibble
  long top = (long)exp_n * 16 - 1;  // nibble index
  while (top >= 0) {
    uint64_t nib = (exp[top / 16] >> ((top % 16) * 4)) & 0xF;
    if (nib) break;
    top--;
  }
  std::vector<uint64_t> acc(n);
  if (top < 0) {  // exp == 0
    memcpy(acc.data(), r.data(), n * 8);
  } else {
    uint64_t nib = (exp[top / 16] >> ((top % 16) * 4)) & 0xF;
    memcpy(acc.data(), table.data() + nib * n, n * 8);
    std::vector<uint64_t> tmp(n);
    for (long i = top - 1; i >= 0; i--) {
      for (int s = 0; s < 4; s++) {
        mont_mul(acc.data(), acc.data(), m, n0inv, n, tmp.data(), t.data());
        acc.swap(tmp);
      }
      nib = (exp[i / 16] >> ((i % 16) * 4)) & 0xF;
      if (nib) {
        mont_mul(acc.data(), table.data() + nib * n, m, n0inv, n, tmp.data(),
                 t.data());
        acc.swap(tmp);
      }
    }
  }

  // convert out of Montgomery form: multiply by 1
  std::vector<uint64_t> one(n, 0);
  one[0] = 1;
  mont_mul(acc.data(), one.data(), m, n0inv, n, out, t.data());
}

}  // extern "C"
