#ifndef ARCH_SHIM_COMMS_H
#define ARCH_SHIM_COMMS_H

#include "mesh.h"

#define MASTER 0
#define NNEIGHBOURS 6
#define EDGE (-1)
enum { NO_INVERT, INVERT_X, INVERT_Y };
enum { PACK, UNPACK };

void initialise_mpi(int argc, char** argv, int* rank, int* nranks);
void initialise_comms(Mesh* mesh);
void finalise_comms(void);
void barrier(void);
double reduce_all_sum(double local);
void handle_boundary_2d(int nx, int ny, Mesh* mesh, double* arr, int invert,
                        int pack);

#endif
