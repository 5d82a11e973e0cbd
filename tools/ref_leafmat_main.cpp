// Golden-parity harness: load a .vxc and print the leaf material id the
// reference resolves for every voxel (CVX_Object::GetLeafMatIndex,
// VX_Object.cpp:722 — the resolution VX_Sim.cpp:534 applies at import),
// plus raw prsm spatial-hash samples for bit-exactness checks.
//
// Usage: ref_leafmat <file.vxc>            -> leaf ids, x-fastest scan order
//        ref_leafmat --prsm <n> <k>        -> prsm(x,y,z,k) over an n^3 grid
#include "VX_Object.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>

int main(int argc, char** argv) {
    if (argc >= 4 && strcmp(argv[1], "--prsm") == 0) {
        int n = atoi(argv[2]);
        int k = atoi(argv[3]);
        for (int z = 0; z < n; z++)
            for (int y = 0; y < n; y++)
                for (int x = 0; x < n; x++)
                    printf("%.17g\n", prsm((vfloat)x, (vfloat)y, (vfloat)z, k));
        return 0;
    }
    if (argc < 2) return 1;
    CVX_Object obj;
    if (!obj.LoadVXCFile(argv[1])) return 2;
    int n = obj.GetStArraySize();
    for (int i = 0; i < n; i++) printf("%d\n", obj.GetLeafMatIndex(i));
    return 0;
}
