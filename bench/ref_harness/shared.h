/* Minimal single-node reimplementation of the UoB-HPC `arch` harness API,
 * written from the call sites in the reference mini-app (see SURVEY.md §2.9).
 * Used ONLY to build the reference omp3 backend for baseline measurement
 * (bench/ref_harness/build.sh); it is not part of the TPU framework.
 */
#ifndef ARCH_SHIM_SHARED_H
#define ARCH_SHIM_SHARED_H

#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

#include "profiler.h"

/* Global kernel-side profile object (referenced by backend kernels). */
extern struct Profile compute_profile;

#define GB (1024.0 * 1024.0 * 1024.0)
#define TERMINATE(...)                                                         \
  do {                                                                         \
    fprintf(stderr, __VA_ARGS__);                                              \
    exit(1);                                                                   \
  } while (0)

#ifndef min
#define min(a, b) ((a) < (b) ? (a) : (b))
#endif
#ifndef max
#define max(a, b) ((a) > (b) ? (a) : (b))
#endif

size_t allocate_data(double** buf, size_t len);
size_t allocate_host_data(double** buf, size_t len);
size_t allocate_int_data(int** buf, size_t len);
size_t allocate_uint64_data(uint64_t** buf, size_t len);
void deallocate_data(double* buf);

enum { SEND, RECV };
void copy_buffer(size_t len, double** src, double** dst, int send);
void move_host_buffer_to_device(size_t len, double** src, double** dst);

void initialise_devices(int rank);
int within_tolerance(double expected, double actual, double tolerance);

#endif

void write_all_ranks_to_visit(int global_nx, int global_ny, int local_nx,
                              int local_ny, int pad, int x_off, int y_off,
                              int rank, int nranks, int* neighbours,
                              double* data, const char* name, int step,
                              double time);
