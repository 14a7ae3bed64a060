/* Single-node implementation of the inferred arch harness API (SURVEY.md
 * §2.9) — just enough to build and run the reference mini-app's omp3 backend
 * for baseline measurement.  Written from call-site semantics; no arch code
 * was available or consulted.
 */
#include "shared.h"
#include "comms.h"
#include "mesh.h"
#include "params.h"
#include "profiler.h"
#include "shared_data.h"

#include <string.h>
#include <time.h>

struct Profile compute_profile;

/* ------------------------------------------------------------------ alloc */

static size_t alloc_zeroed(void** buf, size_t bytes) {
  *buf = calloc(1, bytes);
  if (!*buf) {
    TERMINATE("allocation of %zu bytes failed\n", bytes);
  }
  return bytes;
}

size_t allocate_data(double** buf, size_t len) {
  return alloc_zeroed((void**)buf, len * sizeof(double));
}
size_t allocate_host_data(double** buf, size_t len) {
  return alloc_zeroed((void**)buf, len * sizeof(double));
}
size_t allocate_int_data(int** buf, size_t len) {
  return alloc_zeroed((void**)buf, len * sizeof(int));
}
size_t allocate_uint64_data(uint64_t** buf, size_t len) {
  return alloc_zeroed((void**)buf, len * sizeof(uint64_t));
}
void deallocate_data(double* buf) { free(buf); }

void copy_buffer(size_t len, double** src, double** dst, int send) {
  (void)send; /* host == device in the CPU shim */
  memcpy(*dst, *src, len * sizeof(double));
}

void move_host_buffer_to_device(size_t len, double** src, double** dst) {
  (void)len;
  *dst = *src; /* adopt the host buffer */
}

void initialise_devices(int rank) { (void)rank; }

int within_tolerance(double expected, double actual, double tolerance) {
  if (expected == 0.0) {
    return actual == 0.0;
  }
  double diff = expected - actual;
  if (diff < 0.0) diff = -diff;
  double mag = expected < 0.0 ? -expected : expected;
  return diff / mag <= tolerance;
}

/* ------------------------------------------------------------------ comms */

void initialise_mpi(int argc, char** argv, int* rank, int* nranks) {
  (void)argc;
  (void)argv;
  *rank = 0;
  *nranks = 1;
}
void initialise_comms(Mesh* mesh) {
  mesh->rank = 0;
  mesh->nranks = 1;
  mesh->x_off = 0;
  mesh->y_off = 0;
  allocate_int_data(&mesh->neighbours, NNEIGHBOURS);
  for (int i = 0; i < NNEIGHBOURS; ++i) {
    mesh->neighbours[i] = EDGE;
  }
}
void finalise_comms(void) {}
void barrier(void) {}
double reduce_all_sum(double local) { return local; }
void handle_boundary_2d(int nx, int ny, Mesh* mesh, double* arr, int invert,
                        int pack) {
  (void)nx; (void)ny; (void)mesh; (void)arr; (void)invert; (void)pack;
  /* single rank, pad == 0: nothing to exchange */
}

/* ------------------------------------------------------------------ mesh */

void initialise_mesh_2d(Mesh* mesh) {
  const int nx = mesh->local_nx;
  const int ny = mesh->local_ny;
  allocate_data(&mesh->edgex, nx + 1);
  allocate_data(&mesh->edgey, ny + 1);
  allocate_data(&mesh->edgedx, nx + 1);
  allocate_data(&mesh->edgedy, ny + 1);
  const double dx = mesh->width / mesh->global_nx;
  const double dy = mesh->height / mesh->global_ny;
  for (int i = 0; i <= nx; ++i) {
    mesh->edgex[i] = i * dx;
    mesh->edgedx[i] = dx;
  }
  for (int i = 0; i <= ny; ++i) {
    mesh->edgey[i] = i * dy;
    mesh->edgedy[i] = dy;
  }
}

/* ------------------------------------------------------------ shared_data */

void initialise_shared_data_2d(int local_nx, int local_ny, int pad,
                               double width, double height,
                               const char* params_filename, double* edgex,
                               double* edgey, SharedData* shared_data) {
  allocate_data(&shared_data->density, local_nx * local_ny);

  char keys[MAX_KEYS * MAX_STR_LEN];
  double values[MAX_KEYS];
  for (int pp = 0;; ++pp) {
    char name[64];
    snprintf(name, sizeof(name), "problem_%d", pp);
    int nkeys = 0;
    if (!get_key_value_parameter(name, params_filename, keys, values,
                                 &nkeys)) {
      break;
    }
    double density = 0.0, xpos = 0.0, ypos = 0.0, w = 0.0, h = 0.0;
    for (int k = 0; k < nkeys; ++k) {
      const char* key = &keys[k * MAX_STR_LEN];
      if (!strcmp(key, "density")) density = values[k];
      else if (!strcmp(key, "xpos")) xpos = values[k] * width;
      else if (!strcmp(key, "ypos")) ypos = values[k] * height;
      else if (!strcmp(key, "width")) w = values[k] * width;
      else if (!strcmp(key, "height")) h = values[k] * height;
    }
    for (int jj = pad; jj < local_ny - pad; ++jj) {
      const double cy = 0.5 * (edgey[jj] + edgey[jj + 1]);
      for (int ii = pad; ii < local_nx - pad; ++ii) {
        const double cx = 0.5 * (edgex[ii] + edgex[ii + 1]);
        if (cx >= xpos && cx < xpos + w && cy >= ypos && cy < ypos + h) {
          shared_data->density[jj * local_nx + ii] = density;
        }
      }
    }
  }
}

/* ----------------------------------------------------------------- params */

static int find_line(const char* filename, const char* name, char* line,
                     size_t cap) {
  FILE* fp = fopen(filename, "r");
  if (!fp) {
    TERMINATE("could not open parameter file %s\n", filename);
  }
  size_t nlen = strlen(name);
  while (fgets(line, cap, fp)) {
    char* hash = strchr(line, '#');
    if (hash) *hash = '\0';
    /* match `name` as the first whitespace-delimited token */
    char* p = line;
    while (*p == ' ' || *p == '\t') ++p;
    if (!strncmp(p, name, nlen) &&
        (p[nlen] == ' ' || p[nlen] == '\t' || p[nlen] == '\0' ||
         p[nlen] == '\n' || p[nlen] == '\r')) {
      memmove(line, p + nlen, strlen(p + nlen) + 1);
      fclose(fp);
      return 1;
    }
  }
  fclose(fp);
  return 0;
}

int get_int_parameter(const char* name, const char* filename) {
  char line[4096];
  if (!find_line(filename, name, line, sizeof(line))) {
    TERMINATE("parameter %s not found in %s\n", name, filename);
  }
  return (int)strtol(line, NULL, 10);
}

double get_double_parameter(const char* name, const char* filename) {
  char line[4096];
  if (!find_line(filename, name, line, sizeof(line))) {
    TERMINATE("parameter %s not found in %s\n", name, filename);
  }
  return strtod(line, NULL);
}

int get_key_value_parameter(const char* specifier, const char* filename,
                            char* keys, double* values, int* nkeys) {
  char line[4096];
  if (!find_line(filename, specifier, line, sizeof(line))) {
    return 0;
  }
  *nkeys = 0;
  char* tok = strtok(line, " \t\r\n");
  while (tok && *nkeys < MAX_KEYS) {
    char* eq = strchr(tok, '=');
    if (eq) {
      *eq = '\0';
      strncpy(&keys[*nkeys * MAX_STR_LEN], tok, MAX_STR_LEN - 1);
      keys[*nkeys * MAX_STR_LEN + MAX_STR_LEN - 1] = '\0';
      values[*nkeys] = strtod(eq + 1, NULL);
      ++(*nkeys);
    }
    tok = strtok(NULL, " \t\r\n");
  }
  return *nkeys > 0;
}

/* --------------------------------------------------------------- profiler */

static double now_s(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

void profiler_start(struct Profile* p) { p->t0 = now_s(); }

void profiler_stop(struct Profile* p, const char* name) {
  (void)name;
  if (p->nentries < PROFILER_MAX_ENTRIES) {
    p->profiler_entries[p->nentries++].time = now_s() - p->t0;
  }
}

/* ------------------------------------------------------------- visit dump */

void write_all_ranks_to_visit(int global_nx, int global_ny, int local_nx,
                              int local_ny, int pad, int x_off, int y_off,
                              int rank, int nranks, int* neighbours,
                              double* data, const char* name, int step,
                              double time) {
  (void)global_nx; (void)global_ny; (void)pad; (void)x_off; (void)y_off;
  (void)rank; (void)nranks; (void)neighbours; (void)step; (void)time;
  char fname[256];
  snprintf(fname, sizeof(fname), "%s.dat", name);
  FILE* fp = fopen(fname, "wb");
  if (fp) {
    fwrite(data, sizeof(double), (size_t)local_nx * local_ny, fp);
    fclose(fp);
  }
}
