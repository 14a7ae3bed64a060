#ifndef ARCH_SHIM_MESH_H
#define ARCH_SHIM_MESH_H

#include "shared.h"

typedef struct {
  int global_nx;
  int global_ny;
  int local_nx;
  int local_ny;
  int pad;
  int x_off;
  int y_off;
  double width;
  double height;
  double dt;
  double sim_end;
  int niters;
  int rank;
  int nranks;
  int ndims;
  int* neighbours;
  double* edgex;
  double* edgey;
  double* edgedx;
  double* edgedy;
} Mesh;

void initialise_mesh_2d(Mesh* mesh);

#endif
