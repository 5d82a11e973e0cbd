// Debug driver for parity work: loads a VXA with the reference Voxelyze
// library (compiled out-of-tree by tools/reference_engine.py), steps the
// simulation like voxelyzeMain/main.cpp:89-131 does, and dumps full
// per-voxel state (pos, scale) each step at double precision so the JAX
// engine can be compared step-for-step. Build:
//   g++ -O3 -std=c++11 -I<Voxelyze> -I<Voxelyze>/Utils ref_dump_main.cpp \
//       -L<Voxelyze> -lvoxelyze.0.9 -lm -lstdc++ -lz -o voxelyze_dump
// Usage: voxelyze_dump robot.vxa dump.txt [max_steps]
#include <cstdio>
#include <cstdlib>
#include <string>

#include "VX_SimGA.h"
#include "VX_Object.h"
#include "VX_Environment.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s file.vxa dump.txt [max_steps]\n", argv[0]);
    return 2;
  }
  long max_steps = argc > 3 ? std::atol(argv[3]) : 1000000L;

  CVX_Object object;
  CVX_Environment env;
  CVX_SimGA sim;
  env.pObj = &object;
  sim.pEnv = &env;

  std::string msg;
  if (!sim.LoadVXAFile(argv[1], &msg)) {
    std::fprintf(stderr, "load failed: %s\n", msg.c_str());
    return 1;
  }
  std::string imsg;
  sim.Import(&env, 0, &imsg);
  env.UpdateCurTemp(0, &object);

  FILE* f = std::fopen(argv[2], "w");
  if (!f) return 1;
  std::fprintf(f, "# step time nvox then per voxel: x y z scale\n");

  double t = 0.0;
  long step = 0;
  std::string ret;
  while (!sim.StopConditionMet() && step < max_steps) {
    sim.TimeStep(&ret);
    ++step;
    t += sim.dt;
    env.UpdateCurTemp(t, &object);
    std::fprintf(f, "%ld %.17g %d", step, t, sim.NumVox());
    for (int i = 0; i < sim.NumVox(); ++i) {
      Vec3D<> p = sim.VoxArray[i].GetCurPos();
      std::fprintf(f, " %.17g %.17g %.17g %.17g", p.x, p.y, p.z,
                   sim.VoxArray[i].GetCurScale());
    }
    // per-bond small-angle flags (the hysteresis state of
    // VXS_BondInternal.cpp:74-118) and world-frame Force1 to compare
    // discrete events and the force math itself
    std::fprintf(f, " B %d", sim.NumBond());
    for (int i = 0; i < sim.NumBond(); ++i) {
      Vec3D<> F = sim.BondArrayInternal[i].GetForce1();
      std::fprintf(f, " %d %.17g %.17g %.17g",
                   (int)sim.BondArrayInternal[i].IsSmallAngle(), F.x, F.y, F.z);
    }
    std::fprintf(f, "\n");
  }
  std::fclose(f);
  return 0;
}
