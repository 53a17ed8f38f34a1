/* C coupling test: the reference's driver/main.c loop through the
 * embedded C API — create → while !finished { set source; advance;
 * sanity-check } → destroy. Exit 0 on success. */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

int rdytpu_init(void);
int rdytpu_finalize(void);
int rdytpu_create(const char *, int64_t *);
int rdytpu_destroy(int64_t);
int rdytpu_advance(int64_t);
int rdytpu_finished(int64_t, int32_t *);
int rdytpu_get_time(int64_t, double *);
int rdytpu_get_step(int64_t, int64_t *);
int rdytpu_get_num_cells(int64_t, int64_t *);
int rdytpu_get_height(int64_t, double *, int64_t);
int rdytpu_get_x_momentum(int64_t, double *, int64_t);
int rdytpu_get_cell_areas(int64_t, double *, int64_t);
int rdytpu_set_domain_water_source(int64_t, const double *, int64_t);
int rdytpu_write_checkpoint(int64_t, const char *);
int rdytpu_read_checkpoint(int64_t, const char *);
int rdytpu_convert_time(const char *, double, const char *, double *);
int rdytpu_get_version(char *, int64_t);
int rdytpu_get_num_boundary_conditions(int64_t, int64_t *);
int rdytpu_get_solution(int64_t, double *, int64_t);
int rdytpu_set_initial_conditions(int64_t, const double *, int64_t);
int rdytpu_write_one_dof_vec(int64_t, const char *, const double *, int64_t);
int rdytpu_read_one_dof_vec(int64_t, const char *, double *, int64_t);

#define CHECK(expr)                                             \
  do {                                                          \
    if ((expr) != 0) {                                          \
      fprintf(stderr, "FAIL: %s\n", #expr);                     \
      return 1;                                                 \
    }                                                           \
  } while (0)

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <config.yaml>\n", argv[0]);
    return 2;
  }
  CHECK(rdytpu_init());
  int64_t rdy = 0;
  CHECK(rdytpu_create(argv[1], &rdy));

  int64_t n = 0;
  CHECK(rdytpu_get_num_cells(rdy, &n));
  if (n <= 0) return 1;

  /* misc API parity: version string, time conversion, boundary count */
  char ver[64];
  CHECK(rdytpu_get_version(ver, sizeof ver));
  if (ver[0] == '\0') return 1;
  double t_conv = 0.0;
  CHECK(rdytpu_convert_time("minutes", 2.0, "seconds", &t_conv));
  if (t_conv < 119.9 || t_conv > 120.1) {
    fprintf(stderr, "convert_time wrong: %g\n", t_conv);
    return 1;
  }
  int64_t nbc = 0;
  CHECK(rdytpu_get_num_boundary_conditions(rdy, &nbc));
  if (nbc < 0) return 1;
  double *h = malloc((size_t)n * sizeof(double));
  double *hu = malloc((size_t)n * sizeof(double));
  double *src = calloc((size_t)n, sizeof(double));
  double *area = malloc((size_t)n * sizeof(double));
  CHECK(rdytpu_get_cell_areas(rdy, area, n));

  /* initial volume for the mass budget (rain adds src*area*dt per step) */
  CHECK(rdytpu_get_height(rdy, h, n));
  double vol0 = 0.0;
  for (int64_t i = 0; i < n; ++i) vol0 += h[i] * area[i];

  double t_prev = -1.0;
  int32_t done = 0;
  int intervals = 0;
  for (int i = 0; i < n; ++i) src[i] = 1e-6; /* 1 um/s of rain */
  while (!done) {
    CHECK(rdytpu_set_domain_water_source(rdy, src, n));
    CHECK(rdytpu_advance(rdy));
    double t;
    CHECK(rdytpu_get_time(rdy, &t));
    if (t <= t_prev) { /* time must advance monotonically (main.c:70) */
      fprintf(stderr, "FAIL: time not monotone (%g -> %g)\n", t_prev, t);
      return 1;
    }
    t_prev = t;
    CHECK(rdytpu_get_height(rdy, h, n));
    CHECK(rdytpu_get_x_momentum(rdy, hu, n));
    for (int64_t i = 0; i < n; ++i) {
      if (!isfinite(h[i]) || h[i] < 0.0 || !isfinite(hu[i])) {
        fprintf(stderr, "FAIL: bad state at cell %lld\n", (long long)i);
        return 1;
      }
    }
    CHECK(rdytpu_finished(rdy, &done));
    ++intervals;
  }

  double vol1 = 0.0;
  for (int64_t i = 0; i < n; ++i) vol1 += h[i] * area[i];
  int64_t steps = 0;
  CHECK(rdytpu_get_step(rdy, &steps));
  printf("OK: %d intervals, %lld steps, t=%g, volume %g -> %g\n",
         intervals, (long long)steps, t_prev, vol0, vol1);
  if (vol1 <= vol0) { /* rain fell on reflecting walls: volume must grow */
    fprintf(stderr, "FAIL: rain did not accumulate\n");
    return 1;
  }

  /* coupler-driven checkpoint round-trip (RDy{Write,Read}HDF5Checkpoint) */
  if (argc > 2) {
    CHECK(rdytpu_write_checkpoint(rdy, argv[2]));
    double *h2 = malloc((size_t)n * sizeof(double));
    for (int64_t i = 0; i < n; ++i) h2[i] = -1.0;
    CHECK(rdytpu_read_checkpoint(rdy, argv[2]));
    CHECK(rdytpu_get_height(rdy, h2, n));
    for (int64_t i = 0; i < n; ++i) {
      if (h2[i] != h[i]) {
        fprintf(stderr, "FAIL: checkpoint round-trip mismatch\n");
        return 1;
      }
    }
    free(h2);
    printf("OK: checkpoint round-trip bitwise\n");
  }

  /* one-DOF natural-order binary round trip + set_initial_conditions */
  if (argc > 3) {
    CHECK(rdytpu_write_one_dof_vec(rdy, argv[3], h, n));
    double *hb = malloc((size_t)n * sizeof(double));
    for (int64_t i = 0; i < n; ++i) hb[i] = -1.0;
    CHECK(rdytpu_read_one_dof_vec(rdy, argv[3], hb, n));
    for (int64_t i = 0; i < n; ++i) {
      if (hb[i] != h[i]) {
        fprintf(stderr, "FAIL: one-DOF vec round-trip mismatch\n");
        return 1;
      }
    }
    free(hb);
    /* solution buffers are cell-major interleaved (blocksize ndof), like
     * the reference's PETSc prognostic Vec: q[3*i] = h of cell i */
    double *q = malloc((size_t)(3 * n) * sizeof(double));
    CHECK(rdytpu_get_solution(rdy, q, 3 * n));
    CHECK(rdytpu_set_initial_conditions(rdy, q, 3 * n));
    double *h3 = malloc((size_t)n * sizeof(double));
    CHECK(rdytpu_get_height(rdy, h3, n));
    for (int64_t i = 0; i < n; ++i) {
      if (h3[i] != q[3 * i]) {
        fprintf(stderr, "FAIL: set_initial_conditions mismatch\n");
        return 1;
      }
    }
    free(q); free(h3);
    printf("OK: one-DOF vec round-trip + set_initial_conditions\n");
  }

  CHECK(rdytpu_destroy(rdy));
  CHECK(rdytpu_finalize());
  free(h); free(hu); free(src); free(area);
  return 0;
}
