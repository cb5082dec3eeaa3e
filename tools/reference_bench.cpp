// Reference-baseline timing harness: renders an OBJ with the UNMODIFIED
// reference renderer (headers included from /root/reference, nothing
// copied) and prints build/render timings — the recipe behind
// benchmarks/reference_baseline.md, now checked in so the numbers are
// reproducible on any mesh (the round-5 use: the level-4 subdivided
// bunny, >1M triangles).
//
// Replicates the anim app's per-frame path (include/anim.cpp:54-110):
// obj_norms load, SweepSAH build + NodeLayoutOptimizer, render() at the
// given resolution; timing by std::chrono around build and each render
// (the reference's own method), best of WARM+N renders reported.
//
// Build:
//   g++ -std=c++17 -O3 -mavx2 -mfma -fopenmp -I/root/reference/lib \
//       -I/root/reference/include tools/reference_bench.cpp -o /tmp/ref_bench
// Run:
//   /tmp/ref_bench mesh.obj ex ey ez dx dy dz [width height reps]
// (eye and LOOK DIRECTION passed in so the camera matches the Python
// harness exactly — the vertex centroid is not derivable from the
// triangle soup the reference loader returns.)

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <memory>
#include <vector>

#include <bvh/bvh.hpp>
#include <bvh/sweep_sah_builder.hpp>
#include <bvh/node_layout_optimizer.hpp>
#include <bvh/single_ray_traverser.hpp>
#include <bvh/primitive_intersectors.hpp>
#include <bvh/triangle.hpp>

#include "render.hpp"
#include "obj_norms.hpp"

int main(int argc, char** argv) {
    using Scalar = float;
    using Vector3 = bvh::Vector3<Scalar>;
    using Bvh = bvh::Bvh<Scalar>;
    using clk = std::chrono::high_resolution_clock;

    if (argc < 8) {
        std::cerr << "usage: " << argv[0]
                  << " mesh.obj ex ey ez dx dy dz [w h reps]\n";
        return 2;
    }
    const std::string input = argv[1];
    const Vector3 eye(std::atof(argv[2]), std::atof(argv[3]),
                      std::atof(argv[4]));
    const Vector3 dir(std::atof(argv[5]), std::atof(argv[6]),
                      std::atof(argv[7]));
    const size_t width = argc > 8 ? std::atoi(argv[8]) : 1920;
    const size_t height = argc > 9 ? std::atoi(argv[9]) : 1080;
    const int reps = argc > 10 ? std::atoi(argv[10]) : 5;

    Camera<Scalar> camera = {eye, dir, Vector3(0.0f, 1.0f, 0.0f), 60};
    Vector3 sun_position(-50.0f, 100.0f, 0.0f);

    auto [triangles, tri_norms] = obj::load_from_file<Scalar>(input);
    if (triangles.empty()) {
        std::cerr << "empty scene: " << input << std::endl;
        return 1;
    }
    std::cout << "triangles " << triangles.size() << std::endl;

    auto t0 = clk::now();
    Bvh bvh;
    auto bboxes_and_centers = bvh::compute_bounding_boxes_and_centers(
        triangles.data(), triangles.size());
    auto global_bbox = bvh::compute_bounding_boxes_union(
        bboxes_and_centers.first.get(), triangles.size());
    bvh::SweepSahBuilder<Bvh> builder(bvh);
    builder.build(global_bbox, bboxes_and_centers.first.get(),
                  bboxes_and_centers.second.get(), triangles.size());
    bvh::NodeLayoutOptimizer<Bvh> optimizer(bvh);
    optimizer.optimize();
    double build_s = std::chrono::duration<double>(clk::now() - t0).count();
    std::cout << "build_s " << build_s << " nodes " << bvh.node_count
              << std::endl;

    auto pixels = std::make_unique<Scalar[]>(3 * width * height);
    std::pair<size_t, size_t> counts;
    double best = 1e30;
    for (int r = 0; r < reps + 1; ++r) {   // first iteration = warmup
        auto t1 = clk::now();
        counts = render(camera, sun_position, bvh, triangles.data(),
                        tri_norms.data(), pixels.get(), width, height);
        double dt = std::chrono::duration<double>(clk::now() - t1).count();
        if (r > 0 && dt < best) best = dt;
    }
    std::cout << "rays " << counts.first << " hits " << counts.second
              << std::endl;
    std::cout << "render_s " << best << " rays_per_s "
              << (double)counts.first / best << std::endl;
    return 0;
}
