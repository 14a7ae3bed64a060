#ifndef ARCH_SHIM_SHARED_DATA_H
#define ARCH_SHIM_SHARED_DATA_H

typedef struct {
  double* density;
} SharedData;

void initialise_shared_data_2d(int local_nx, int local_ny, int pad,
                               double width, double height,
                               const char* params_filename, double* edgex,
                               double* edgey, SharedData* shared_data);

#endif
