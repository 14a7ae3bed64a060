#ifndef ARCH_SHIM_PARAMS_H
#define ARCH_SHIM_PARAMS_H

#define MAX_KEYS 10
#define MAX_STR_LEN 256

int get_int_parameter(const char* name, const char* filename);
double get_double_parameter(const char* name, const char* filename);
/* Returns 1 and fills keys (flat buffer, stride MAX_STR_LEN) + values when a
 * line starting with `specifier` is found; 0 otherwise. */
int get_key_value_parameter(const char* specifier, const char* filename,
                            char* keys, double* values, int* nkeys);

#endif
