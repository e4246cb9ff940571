// Native host backend: class-group arithmetic (compose / nudupl / nupow)
// over GMP with OpenMP data parallelism across batch elements.
//
// Role: the CPU-path equivalent of the reference's BICYCL+OpenMP hot loops
// (reference: include/x86_64/qfi.inl:1-135 uses BICYCL::QFI nucomp/nupow;
// include/x86_64/openmp.hpp:4-11 provides the parallel-for). This file is an
// independent implementation of Gauss composition / reduction / windowed
// exponentiation, mirroring the pure-Python oracle in cofhe_tpu/core/qfi.py
// (which all JAX kernels are validated against bit-exactly).
//
// The system image ships libgmp.so.10 but no gmp.h, so the (decades-stable)
// mpz ABI is declared locally below; link with -l:libgmp.so.10.
//
// Boundary format (ctypes, see cofhe_tpu/ops/hostgmp.py):
//   a batch of n forms = (n, 3, stride) little-endian magnitude bytes
//   (fields a, b, c) + (n, 3) int8 signs; exponents = (n, elen) LE bytes +
//   (n,) int8 signs.  |D| is passed as one LE byte field.

#include <cstdint>
#include <cstring>
#include <cstdlib>

#ifdef _OPENMP
#include <omp.h>
#endif

// ---------------------------------------------------------------- GMP ABI
extern "C" {
typedef unsigned long mp_limb_t;
typedef struct {
  int _mp_alloc;
  int _mp_size;
  mp_limb_t *_mp_d;
} __mpz_struct;
typedef __mpz_struct mpz_t[1];
typedef __mpz_struct *mpz_ptr;
typedef const __mpz_struct *mpz_srcptr;

void __gmpz_init(mpz_ptr);
void __gmpz_init2(mpz_ptr, unsigned long);
void __gmpz_clear(mpz_ptr);
void __gmpz_set(mpz_ptr, mpz_srcptr);
void __gmpz_set_si(mpz_ptr, long);
void __gmpz_swap(mpz_ptr, mpz_ptr);
void __gmpz_add(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_sub(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_mul(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_mul_si(mpz_ptr, mpz_srcptr, long);
void __gmpz_mul_2exp(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_fdiv_q_2exp(mpz_ptr, mpz_srcptr, unsigned long);
void __gmpz_addmul(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_submul(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_neg(mpz_ptr, mpz_srcptr);
void __gmpz_fdiv_qr(mpz_ptr, mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_fdiv_q(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_fdiv_r(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_divexact(mpz_ptr, mpz_srcptr, mpz_srcptr);
void __gmpz_gcdext(mpz_ptr, mpz_ptr, mpz_ptr, mpz_srcptr, mpz_srcptr);
int __gmpz_cmp(mpz_srcptr, mpz_srcptr);
int __gmpz_cmpabs(mpz_srcptr, mpz_srcptr);
int __gmpz_cmp_ui(mpz_srcptr, unsigned long);
void __gmpz_import(mpz_ptr, size_t, int, size_t, int, size_t, const void *);
void *__gmpz_export(void *, size_t *, int, size_t, int, size_t, mpz_srcptr);
size_t __gmpz_sizeinbase(mpz_srcptr, int);
int __gmpz_tstbit(mpz_srcptr, unsigned long);
void __gmpz_sqrt(mpz_ptr, mpz_srcptr);
void __gmpz_add_ui(mpz_ptr, mpz_srcptr, unsigned long);
}

static inline int mpz_sgn_(mpz_srcptr x) {
  return x->_mp_size < 0 ? -1 : (x->_mp_size > 0 ? 1 : 0);
}

// ------------------------------------------------------------- marshalling
static void load_field(mpz_ptr z, const uint8_t *bytes, int64_t stride,
                       int8_t sign) {
  __gmpz_import(z, (size_t)stride, -1, 1, 0, 0, bytes);
  if (sign < 0) __gmpz_neg(z, z);
}

static void store_field(uint8_t *bytes, int8_t *sign, int64_t stride,
                        mpz_srcptr z) {
  std::memset(bytes, 0, (size_t)stride);
  size_t count = 0;
  if (mpz_sgn_(z) != 0) __gmpz_export(bytes, &count, -1, 1, 0, 0, z);
  *sign = (int8_t)(mpz_sgn_(z) < 0 ? -1 : 1);
}

// ------------------------------------------------------------ form helpers
// All routines take |D| (positive); the discriminant is D = -|D| < 0.
// c is always recomputed as (b^2 + |D|) / (4a).

struct Scratch {
  mpz_t a, b, c, t0, t1, t2, q, r, g, u, v, g2, x, y;
  Scratch() {
    __gmpz_init(a); __gmpz_init(b); __gmpz_init(c);
    __gmpz_init(t0); __gmpz_init(t1); __gmpz_init(t2);
    __gmpz_init(q); __gmpz_init(r); __gmpz_init(g);
    __gmpz_init(u); __gmpz_init(v); __gmpz_init(g2);
    __gmpz_init(x); __gmpz_init(y);
  }
  ~Scratch() {
    __gmpz_clear(a); __gmpz_clear(b); __gmpz_clear(c);
    __gmpz_clear(t0); __gmpz_clear(t1); __gmpz_clear(t2);
    __gmpz_clear(q); __gmpz_clear(r); __gmpz_clear(g);
    __gmpz_clear(u); __gmpz_clear(v); __gmpz_clear(g2);
    __gmpz_clear(x); __gmpz_clear(y);
  }
};

// c = (b^2 + |D|) / (4a)
static void set_c(mpz_ptr c, mpz_srcptr a, mpz_srcptr b, mpz_srcptr absD,
                  mpz_ptr t0, mpz_ptr t1) {
  __gmpz_mul(t0, b, b);
  __gmpz_add(t0, t0, absD);
  __gmpz_mul_2exp(t1, a, 2);
  __gmpz_divexact(c, t0, t1);
}

// normalize in place: -a < b <= a  (qfi.py:56-65)
static void normalize(Scratch &s, mpz_srcptr absD) {
  __gmpz_mul_2exp(s.t0, s.a, 1);       // 2a
  __gmpz_fdiv_r(s.r, s.b, s.t0);       // b mod 2a in [0, 2a)
  if (__gmpz_cmp(s.r, s.a) > 0) __gmpz_sub(s.r, s.r, s.t0);
  if (__gmpz_cmp(s.r, s.b) != 0) {
    __gmpz_set(s.b, s.r);
    set_c(s.c, s.a, s.b, absD, s.t0, s.t1);
  }
}

// full reduction (qfi.py:83-96); expects c consistent with (a, b, |D|).
// Each rho step updates c INCREMENTALLY from the quotient
// (c_new = a + q*(q*c - b), two small-operand muls) instead of recomputing
// (b^2 + |D|)/(4a) — the full-width square per step was the dominant cost
// of the pre-NUCOMP reduction (BASELINE.md's 2-4x caveat).
static void reduce(Scratch &s, mpz_srcptr absD) {
  normalize(s, absD);
  for (;;) {
    int ac = __gmpz_cmp(s.a, s.c);
    if (ac < 0 || (ac == 0 && mpz_sgn_(s.b) >= 0)) break;
    // rho: (a, b, c) <- (c, -b mod 2c, a + q*(q*c + b_neg)) where
    // -b = 2c*q + b_new  =>  q = floor(-b / 2c)
    __gmpz_neg(s.b, s.b);                 // b <- -b
    __gmpz_mul_2exp(s.t0, s.c, 1);        // 2c
    __gmpz_fdiv_qr(s.q, s.r, s.b, s.t0);  // -b = q*2c + r, 0 <= r < 2c
    if (__gmpz_cmp(s.r, s.c) > 0) {       // centered: b_new in (-c, c]
      __gmpz_sub(s.r, s.r, s.t0);
      __gmpz_add_ui(s.q, s.q, 1);
    }
    // c_new = a - q*(b_old_neg + b_new)/2 with b_old_neg = q*2c + ... use
    // c_new = (b_new^2 + |D|)/(4c) = a + q*( (b_new + (-b_old)) / 2 )...
    // exact identity: -b_old = 2c*q + b_new  =>
    //   c_new = a + q*(c*q + b_new)  - q*... derive:
    //   4c*c_new = b_new^2 + |D| ; 4c*a = b_old^2 + |D|
    //   => c_new = a + (b_new^2 - b_old^2)/(4c) = a + (b_new - b_old)(b_new + b_old)/(4c)
    //   with b_old = -(2c*q + b_new): b_new - b_old = 2(c*q + b_new) - ...
    //   b_new + b_old = -2c*q ; b_new - b_old = 2c*q + 2b_new
    //   => c_new = a - q*(c*q + b_new)... check sign: (b_new-b_old)(b_new+b_old)
    //      = (2c*q + 2b_new)(-2c*q) = -4c*q*(c*q + b_new)
    //   => c_new = a - q*(c*q + b_new)
    __gmpz_mul(s.t1, s.q, s.c);
    __gmpz_add(s.t1, s.t1, s.r);
    __gmpz_mul(s.t1, s.t1, s.q);
    __gmpz_sub(s.t1, s.a, s.t1);          // c_new
    __gmpz_swap(s.a, s.c);                // a <- c
    __gmpz_set(s.b, s.r);                 // b <- b_new
    __gmpz_swap(s.c, s.t1);               // c <- c_new
  }
}

// class inverse in place (qfi.py:99-104): b <- -b unless on the boundary
static void neg_form(Scratch &s) {
  if (__gmpz_cmp(s.b, s.a) == 0 || __gmpz_cmp(s.a, s.c) == 0) return;
  __gmpz_neg(s.b, s.b);
}

// Extra scratch for the NUCOMP partial-Euclid state (per thread).
struct NucompScratch {
  mpz_t A, Bq, mu, rp, rc, yp, yc, T, qq, nA, nB, nC, w0, w1;
  NucompScratch() {
    __gmpz_init(A); __gmpz_init(Bq); __gmpz_init(mu);
    __gmpz_init(rp); __gmpz_init(rc); __gmpz_init(yp); __gmpz_init(yc);
    __gmpz_init(T); __gmpz_init(qq); __gmpz_init(nA); __gmpz_init(nB);
    __gmpz_init(nC); __gmpz_init(w0); __gmpz_init(w1);
  }
  ~NucompScratch() {
    __gmpz_clear(A); __gmpz_clear(Bq); __gmpz_clear(mu);
    __gmpz_clear(rp); __gmpz_clear(rc); __gmpz_clear(yp); __gmpz_clear(yc);
    __gmpz_clear(T); __gmpz_clear(qq); __gmpz_clear(nA); __gmpz_clear(nB);
    __gmpz_clear(nC); __gmpz_clear(w0); __gmpz_clear(w1);
  }
};

// NUCOMP core: given the anchored composition data
//   a3 = A*B, b3 = b1 + A*mu (mod 2*a3), g = gcd-content,
// partially reduce via the continued fraction of mu / 2B BEFORE forming the
// full-size coefficients. Lattice view: the composed form is the norm form
// of the ideal with basis [a3, (-b3+sqrt(D))/2]; the transformed basis
// vector z_i = (x_i, y_i) with 2B*x_i + mu*y_i = r_i evaluates to
//   Q(z_i) = [A*r_i^2 + 2*r_i*b1*y_i + 4*g*c1*y_i^2] / (4B)
// and the cross term of consecutive convergents (det ±1) gives b'. The
// Euclid remainders/cofactors stay ~half-size, so every product here is a
// half-width mul — this is the partial-reduction variant the reference
// gets from BICYCL's nucomp (qfi.inl call sites), removing BASELINE.md's
// "generic Gauss" caveat. Validated bit-exactly against the pure-Python
// oracle (tests/test_hostgmp.py).
static void nucomp_core(Scratch &o, NucompScratch &n, mpz_srcptr b1,
                        mpz_srcptr c1, mpz_srcptr g, mpz_srcptr absD) {
  // n.A, n.Bq ( = B), n.mu set by caller; o gets the result (pre-reduce)
  // threshold T ~ sqrt(2B * sqrt(|D|/4) / sqrt(A*B))
  __gmpz_fdiv_q_2exp(n.T, absD, 2);
  __gmpz_sqrt(n.T, n.T);                       // sqrt(|D|/4)
  __gmpz_mul(n.qq, n.A, n.Bq);
  __gmpz_sqrt(n.qq, n.qq);                     // sqrt(A*B)
  __gmpz_mul(n.rp, n.Bq, n.T);
  __gmpz_mul_2exp(n.rp, n.rp, 1);              // 2B*sqrt(|D|/4)
  if (__gmpz_cmp_ui(n.qq, 1) < 0) __gmpz_set_si(n.qq, 1);
  __gmpz_fdiv_q(n.T, n.rp, n.qq);
  __gmpz_sqrt(n.T, n.T);
  // partial Euclid on (2B, mu): r_{-1} = 2B, r_0 = mu; y_i tracks
  // y*mu ≡ r (mod 2B); stop when r <= T
  __gmpz_mul_2exp(n.rp, n.Bq, 1);
  __gmpz_set(n.rc, n.mu);
  __gmpz_set_si(n.yp, 0);
  __gmpz_set_si(n.yc, 1);
  int parity = 0;  // det(z_prev, z_cur) = +1 at step 0, flips per step
  while (__gmpz_cmp(n.rc, n.T) > 0) {
    __gmpz_fdiv_qr(n.qq, o.t0, n.rp, n.rc);
    __gmpz_swap(n.rp, n.rc);
    __gmpz_swap(n.rc, o.t0);
    __gmpz_submul(n.yp, n.qq, n.yc);           // y_next = y_prev - q*y_cur
    __gmpz_swap(n.yp, n.yc);
    parity ^= 1;
  }
  // w0 = 4*g*c1 (shared term)
  __gmpz_mul(n.w0, g, c1);
  __gmpz_mul_2exp(n.w0, n.w0, 2);
  // nA = [A*rp^2 + 2*rp*b1*yp + 4*g*c1*yp^2] / 4B
  __gmpz_mul(o.t0, n.rp, n.rp);
  __gmpz_mul(o.t0, o.t0, n.A);
  __gmpz_mul(o.t1, n.rp, b1);
  __gmpz_mul(o.t1, o.t1, n.yp);
  __gmpz_mul_2exp(o.t1, o.t1, 1);
  __gmpz_add(o.t0, o.t0, o.t1);
  __gmpz_mul(o.t1, n.yp, n.yp);
  __gmpz_addmul(o.t0, o.t1, n.w0);
  __gmpz_mul_2exp(o.t2, n.Bq, 2);              // 4B
  __gmpz_divexact(n.nA, o.t0, o.t2);
  // nC = [A*rc^2 + 2*rc*b1*yc + 4*g*c1*yc^2] / 4B
  __gmpz_mul(o.t0, n.rc, n.rc);
  __gmpz_mul(o.t0, o.t0, n.A);
  __gmpz_mul(o.t1, n.rc, b1);
  __gmpz_mul(o.t1, o.t1, n.yc);
  __gmpz_mul_2exp(o.t1, o.t1, 1);
  __gmpz_add(o.t0, o.t0, o.t1);
  __gmpz_mul(o.t1, n.yc, n.yc);
  __gmpz_addmul(o.t0, o.t1, n.w0);
  __gmpz_divexact(n.nC, o.t0, o.t2);
  // nB = [A*rp*rc + b1*(rp*yc + rc*yp) + 4*g*c1*yp*yc] / 2B
  __gmpz_mul(o.t0, n.rp, n.rc);
  __gmpz_mul(o.t0, o.t0, n.A);
  __gmpz_mul(o.t1, n.rp, n.yc);
  __gmpz_addmul(o.t1, n.rc, n.yp);
  __gmpz_mul(o.t1, o.t1, b1);
  __gmpz_add(o.t0, o.t0, o.t1);
  __gmpz_mul(o.t1, n.yp, n.yc);
  __gmpz_addmul(o.t0, o.t1, n.w0);
  __gmpz_mul_2exp(o.t2, n.Bq, 1);              // 2B
  __gmpz_divexact(n.nB, o.t0, o.t2);
  // improper transform (det = -1) conjugates the class: flip b back
  if (parity) __gmpz_neg(n.nB, n.nB);
  __gmpz_set(o.a, n.nA);
  __gmpz_set(o.b, n.nB);
  __gmpz_set(o.c, n.nC);
  reduce(o, absD);
}

// s <- reduce(f1 * f2)  (NUCOMP; generic-Gauss congruence + partial
// reduction. Anchoring identity b3 ≡ b1 (mod 2*a1/g) per ops/forms.py.)
static void compose(Scratch &o, NucompScratch &n, const Scratch &f1,
                    const Scratch &f2, mpz_srcptr absD) {
  // sgl = (b1 + b2) / 2  (exact: b1 ≡ b2 ≡ D mod 2)
  __gmpz_add(o.t2, f1.b, f2.b);
  __gmpz_fdiv_q_2exp(o.t2, o.t2, 1);
  // g0 = u*a1 + v*a2
  __gmpz_gcdext(o.g, o.u, o.v, f1.a, f2.a);
  // g = x*g0 + y*s
  __gmpz_gcdext(o.g2, o.x, o.y, o.g, o.t2);
  // a3 = a1*a2 / g^2
  __gmpz_mul(o.t0, f1.a, f2.a);
  __gmpz_mul(o.t1, o.g2, o.g2);
  __gmpz_divexact(o.a, o.t0, o.t1);
  // num = x*u*a1*b2 + x*v*a2*b1 + y*(b1*b2 - |D|)/2
  __gmpz_mul(o.u, o.u, o.x);
  __gmpz_mul(o.v, o.v, o.x);
  __gmpz_mul(o.t0, o.u, f1.a);
  __gmpz_mul(o.t0, o.t0, f2.b);       // x*u*a1*b2
  __gmpz_mul(o.t1, o.v, f2.a);
  __gmpz_addmul(o.t0, o.t1, f1.b);    // += x*v*a2*b1
  __gmpz_mul(o.t1, f1.b, f2.b);
  __gmpz_sub(o.t1, o.t1, absD);       // b1*b2 + D
  __gmpz_fdiv_q_2exp(o.t1, o.t1, 1);  // (b1*b2 + D)/2, exact
  __gmpz_addmul(o.t0, o.y, o.t1);     // += y*(b1*b2 + D)/2
  __gmpz_divexact(o.t0, o.t0, o.g2);  // num / g
  // b3 = num/g mod 2*a3
  __gmpz_mul_2exp(o.t1, o.a, 1);
  __gmpz_fdiv_r(o.b, o.t0, o.t1);
  // partial reduction: A = a1/g, B = a2/g, mu = ((b3 - b1)/A) mod 2B
  __gmpz_divexact(n.A, f1.a, o.g2);
  __gmpz_divexact(n.Bq, f2.a, o.g2);
  __gmpz_sub(o.t0, o.b, f1.b);
  __gmpz_divexact(o.t0, o.t0, n.A);
  __gmpz_mul_2exp(o.t1, n.Bq, 1);
  __gmpz_fdiv_r(n.mu, o.t0, o.t1);
  nucomp_core(o, n, f1.b, f1.c, o.g2, absD);
}

// o <- reduce(f^2)  (NUDUPL: same partial-reduction core with
// A = B = a/g, anchored on (b, c) of f itself)
static void nudupl(Scratch &o, NucompScratch &n, const Scratch &f,
                   mpz_srcptr absD) {
  __gmpz_gcdext(o.g, o.x, o.y, f.a, f.b);  // g = x*a + y*b
  __gmpz_divexact(n.A, f.a, o.g);
  __gmpz_mul(o.a, n.A, n.A);               // a3 = (a/g)^2
  // num = x*a*b + y*(b^2 - 2ac)
  __gmpz_mul(o.t0, f.b, f.b);
  __gmpz_mul(o.t1, f.a, f.c);
  __gmpz_mul_2exp(o.t1, o.t1, 1);
  __gmpz_sub(o.t0, o.t0, o.t1);            // b^2 - 2ac
  __gmpz_mul(o.t0, o.t0, o.y);
  __gmpz_mul(o.t1, o.x, f.a);
  __gmpz_addmul(o.t0, o.t1, f.b);          // += x*a*b
  __gmpz_divexact(o.t0, o.t0, o.g);
  __gmpz_mul_2exp(o.t1, o.a, 1);
  __gmpz_fdiv_r(o.b, o.t0, o.t1);
  __gmpz_set(n.Bq, n.A);
  __gmpz_sub(o.t0, o.b, f.b);
  __gmpz_divexact(o.t0, o.t0, n.A);
  __gmpz_mul_2exp(o.t1, n.Bq, 1);
  __gmpz_fdiv_r(n.mu, o.t0, o.t1);
  nucomp_core(o, n, f.b, f.c, o.g, absD);
}

// identity form (1, |D| odd ? 1 : 0, c)
static void set_identity(Scratch &s, mpz_srcptr absD) {
  __gmpz_set_si(s.a, 1);
  __gmpz_set_si(s.b, (long)__gmpz_tstbit(absD, 0));
  set_c(s.c, s.a, s.b, absD, s.t0, s.t1);
}

// o <- reduce(f^e), 4-bit left-to-right fixed window (qfi.py:147-186)
static void nupow(Scratch &o, Scratch &f, mpz_ptr e, mpz_srcptr absD,
                  Scratch *tab /* 8 scratches */, Scratch &f2,
                  NucompScratch &ns) {
  if (mpz_sgn_(e) == 0) { set_identity(o, absD); return; }
  if (mpz_sgn_(e) < 0) { neg_form(f); __gmpz_neg(e, e); }
  reduce(f, absD);
  if (__gmpz_cmp_ui(e, 1) == 0) {
    __gmpz_set(o.a, f.a); __gmpz_set(o.b, f.b); __gmpz_set(o.c, f.c);
    return;
  }
  const int w = 4;
  nudupl(f2, ns, f, absD);
  __gmpz_set(tab[0].a, f.a); __gmpz_set(tab[0].b, f.b);
  __gmpz_set(tab[0].c, f.c);
  for (int i = 1; i < (1 << (w - 1)); i++)
    compose(tab[i], ns, tab[i - 1], f2, absD);  // tab[i] = f^(2i+1)
  long nb = (long)__gmpz_sizeinbase(e, 2);
  long j = nb - 1;
  bool have = false;
  while (j >= 0) {
    if (!__gmpz_tstbit(e, (unsigned long)j)) {
      if (have) { nudupl(f2, ns, o, absD);
        __gmpz_swap(o.a, f2.a); __gmpz_swap(o.b, f2.b);
        __gmpz_swap(o.c, f2.c); }
      j--;
      continue;
    }
    long lo = j - w + 1;
    if (lo < 0) lo = 0;
    while (!__gmpz_tstbit(e, (unsigned long)lo)) lo++;
    long width = j - lo + 1;
    long digit = 0;
    for (long t = j; t >= lo; t--)
      digit = (digit << 1) | __gmpz_tstbit(e, (unsigned long)t);
    if (!have) {
      Scratch &src = tab[digit >> 1];
      __gmpz_set(o.a, src.a); __gmpz_set(o.b, src.b); __gmpz_set(o.c, src.c);
      have = true;
    } else {
      for (long t = 0; t < width; t++) {
        nudupl(f2, ns, o, absD);
        __gmpz_swap(o.a, f2.a); __gmpz_swap(o.b, f2.b); __gmpz_swap(o.c, f2.c);
      }
      compose(f2, ns, o, tab[digit >> 1], absD);
      __gmpz_swap(o.a, f2.a); __gmpz_swap(o.b, f2.b); __gmpz_swap(o.c, f2.c);
    }
    j = lo - 1;
  }
}

// ------------------------------------------------------------- batch entry
struct DiscHolder {
  mpz_t absD;
  DiscHolder(const uint8_t *d, int64_t dlen) {
    __gmpz_init(absD);
    __gmpz_import(absD, (size_t)dlen, -1, 1, 0, 0, d);
  }
  ~DiscHolder() { __gmpz_clear(absD); }
};

static void load_form(Scratch &s, const uint8_t *base, const int8_t *signs,
                      int64_t i, int64_t stride) {
  load_field(s.a, base + (i * 3 + 0) * stride, stride, signs[i * 3 + 0]);
  load_field(s.b, base + (i * 3 + 1) * stride, stride, signs[i * 3 + 1]);
  load_field(s.c, base + (i * 3 + 2) * stride, stride, signs[i * 3 + 2]);
}

static void store_form(uint8_t *base, int8_t *signs, int64_t i,
                       int64_t stride, const Scratch &s) {
  store_field(base + (i * 3 + 0) * stride, &signs[i * 3 + 0], stride, s.a);
  store_field(base + (i * 3 + 1) * stride, &signs[i * 3 + 1], stride, s.b);
  store_field(base + (i * 3 + 2) * stride, &signs[i * 3 + 2], stride, s.c);
}

extern "C" {

int cg_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// out[i] = reduce(f1[i] * f2[i])
void cg_compose_batch(const uint8_t *f1, const int8_t *s1, const uint8_t *f2,
                      const int8_t *s2, uint8_t *out, int8_t *so, int64_t n,
                      int64_t stride, const uint8_t *disc, int64_t dlen) {
  DiscHolder D(disc, dlen);
#pragma omp parallel
  {
    Scratch a, b, o;
    NucompScratch ns;
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; i++) {
      load_form(a, f1, s1, i, stride);
      load_form(b, f2, s2, i, stride);
      compose(o, ns, a, b, D.absD);
      store_form(out, so, i, stride, o);
    }
  }
}

// out[i] = reduce(f[i]^2)
void cg_nudupl_batch(const uint8_t *f, const int8_t *s, uint8_t *out,
                     int8_t *so, int64_t n, int64_t stride,
                     const uint8_t *disc, int64_t dlen) {
  DiscHolder D(disc, dlen);
#pragma omp parallel
  {
    Scratch a, o;
    NucompScratch ns;
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; i++) {
      load_form(a, f, s, i, stride);
      nudupl(o, ns, a, D.absD);
      store_form(out, so, i, stride, o);
    }
  }
}

// out[i*p + j] = reduce(f[i] ^ e[i*p + j]) with the doubling chain of f[i]
// shared across its p exponents (the reference's cross-exponent cache,
// qfi.inl:28-62, in right-to-left binary form). Class inversion is free
// (negate b), so negative exponents reuse the same chain.
void cg_nupow_shared_batch(const uint8_t *f, const int8_t *s,
                           const uint8_t *exps, const int8_t *esigns,
                           int64_t elen, int64_t p, uint8_t *out, int8_t *so,
                           int64_t n, int64_t stride, const uint8_t *disc,
                           int64_t dlen) {
  DiscHolder D(disc, dlen);
#pragma omp parallel
  {
    Scratch base, chain, tmp, negv;
    NucompScratch ns;
    Scratch *acc = new Scratch[(size_t)p];
    mpz_t *e = new mpz_t[(size_t)p];
    bool *neg_e = new bool[(size_t)p];
    bool *have = new bool[(size_t)p];
    for (int64_t j = 0; j < p; j++) __gmpz_init(e[j]);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; i++) {
      load_form(base, f, s, i, stride);
      reduce(base, D.absD);
      long maxbits = 0;
      for (int64_t j = 0; j < p; j++) {
        __gmpz_import(e[j], (size_t)elen, -1, 1, 0, 0, exps + (i * p + j) * elen);
        neg_e[j] = esigns[i * p + j] < 0;
        have[j] = false;
        if (mpz_sgn_(e[j]) != 0) {
          long nb = (long)__gmpz_sizeinbase(e[j], 2);
          if (nb > maxbits) maxbits = nb;
        }
      }
      __gmpz_set(chain.a, base.a); __gmpz_set(chain.b, base.b);
      __gmpz_set(chain.c, base.c);
      for (long t = 0; t < maxbits; t++) {
        for (int64_t j = 0; j < p; j++) {
          if (!__gmpz_tstbit(e[j], (unsigned long)t)) continue;
          // term = chain (or its class inverse for negative exponents)
          const Scratch *term = &chain;
          if (neg_e[j]) {
            __gmpz_set(negv.a, chain.a); __gmpz_set(negv.b, chain.b);
            __gmpz_set(negv.c, chain.c);
            neg_form(negv);
            term = &negv;
          }
          if (!have[j]) {
            __gmpz_set(acc[j].a, term->a); __gmpz_set(acc[j].b, term->b);
            __gmpz_set(acc[j].c, term->c);
            have[j] = true;
          } else {
            compose(tmp, ns, acc[j], *term, D.absD);
            __gmpz_swap(acc[j].a, tmp.a); __gmpz_swap(acc[j].b, tmp.b);
            __gmpz_swap(acc[j].c, tmp.c);
          }
        }
        if (t + 1 < maxbits) {
          nudupl(tmp, ns, chain, D.absD);
          __gmpz_swap(chain.a, tmp.a); __gmpz_swap(chain.b, tmp.b);
          __gmpz_swap(chain.c, tmp.c);
        }
      }
      for (int64_t j = 0; j < p; j++) {
        if (!have[j]) set_identity(acc[j], D.absD);
        store_form(out, so, i * p + j, stride, acc[j]);
      }
    }
    for (int64_t j = 0; j < p; j++) __gmpz_clear(e[j]);
    delete[] acc; delete[] e; delete[] neg_e; delete[] have;
  }
}

// out[i] = reduce(f[i]^e[i])
void cg_nupow_batch(const uint8_t *f, const int8_t *s, const uint8_t *exps,
                    const int8_t *esigns, int64_t elen, uint8_t *out,
                    int8_t *so, int64_t n, int64_t stride,
                    const uint8_t *disc, int64_t dlen) {
  DiscHolder D(disc, dlen);
#pragma omp parallel
  {
    Scratch a, o, f2;
    NucompScratch ns;
    Scratch tab[8];
    mpz_t e;
    __gmpz_init(e);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; i++) {
      load_form(a, f, s, i, stride);
      __gmpz_import(e, (size_t)elen, -1, 1, 0, 0, exps + i * elen);
      if (esigns[i] < 0) __gmpz_neg(e, e);
      nupow(o, a, e, D.absD, tab, f2, ns);
      store_form(out, so, i, stride, o);
    }
    __gmpz_clear(e);
  }
}

}  // extern "C"
