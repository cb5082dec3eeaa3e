// Golden-fixture generator: renders a small frame with the UNMODIFIED
// reference renderer (headers included from /root/reference, nothing
// copied) and writes a binary PPM. The output is checked in as
// tests/fixtures/bunny_64_smooth_ref.ppm and compared against our
// reference_compat=True render path (see tests/test_reference_compat.py).
//
// Build + run (see tests/fixtures/README.md):
//   g++ -std=c++17 -O3 -mavx2 -mfma -I/root/reference/lib \
//       -I/root/reference/include tools/reference_fixture.cpp \
//       -o /tmp/ref_fixture
//   /tmp/ref_fixture /root/reference/data/bunny.obj \
//       tests/fixtures/bunny_64_smooth_ref.ppm
//
// Scene: the BASELINE config-1 camera — eye (0, .1, -.3) looking at the
// bunny vertex centroid (hardcoded below, computed once by
// ceres_tpu.io.obj), up (0,1,0), fov 60, sun (-50, 100, 0), 64x64,
// smooth shading — matching tests/test_reference_compat.py literals.

#include <cstdio>
#include <fstream>
#include <iostream>
#include <memory>
#include <vector>

#include <bvh/bvh.hpp>
#include <bvh/sweep_sah_builder.hpp>
#include <bvh/single_ray_traverser.hpp>
#include <bvh/primitive_intersectors.hpp>
#include <bvh/triangle.hpp>

#include "render.hpp"
#include "obj_norms.hpp"

int main(int argc, char** argv) {
    using Scalar = float;
    using Vector3 = bvh::Vector3<Scalar>;
    using Bvh = bvh::Bvh<Scalar>;

    const std::string input = argc > 1 ? argv[1] : "/root/reference/data/bunny.obj";
    const std::string output = argc > 2 ? argv[2] : "bunny_64_smooth_ref.ppm";
    // "bunny" (BASELINE config 1) or "dragon_static" (the static.cpp
    // scene preset, static.cpp:38-47: dragon, eye (0,-15,2), dir (0,1,0),
    // up (0,0,1), fov 60, sun (-50,-20,0), mesh rotated +90 deg about x).
    // The checked-in static app would crash (null tri_norms into
    // smooth_shading, SURVEY.md 3.2); the fixture renders the preset
    // through the WORKING reference path (normals loaded via obj_norms).
    const std::string preset = argc > 3 ? argv[3] : "bunny";
    const size_t width = 64, height = 64;

    Camera<Scalar> camera = {
        Vector3(0.0f, 0.1f, -0.3f),
        // rotated bunny vertex centroid (0.01777489, 0.09421548,
        // -0.02349359) - eye (mesh rotated -145 deg about y below)
        Vector3(0.01777489f, -0.00578452f, 0.27650642f),
        Vector3(0.0f, 1.0f, 0.0f),
        60,
    };
    Vector3 sun_position(-50.0f, 100.0f, 0.0f);
    size_t rot_axis = 1;
    Scalar deg = -145.0f;
    if (preset == "dragon_static") {
        camera = {Vector3(0.0f, -15.0f, 2.0f), Vector3(0.0f, 1.0f, 0.0f),
                  Vector3(0.0f, 0.0f, 1.0f), 60};
        sun_position = Vector3(-50.0f, -20.0f, 0.0f);
        rot_axis = 0;
        deg = 90.0f;
    }

    auto [triangles, tri_norms] = obj::load_from_file<Scalar>(input);
    if (triangles.empty()) {
        std::cerr << "empty scene: " << input << std::endl;
        return 1;
    }

    // The reference's rotate_triangles (render.hpp:24-44) rebuilds the
    // triangles; the accumulated vertex normals rotate with the same
    // matrix (pure rotation commutes with the normal accumulation).
    if (rot_axis == 1)
        rotate_triangles<1, Scalar>(deg, triangles.data(), triangles.size());
    else
        rotate_triangles<0, Scalar>(deg, triangles.data(), triangles.size());
    {
        const Scalar pi = Scalar(3.14159265359);
        const Scalar c = std::cos(deg * pi / 180), s = std::sin(deg * pi / 180);
        for (auto& corners : tri_norms)
            for (auto& nrm : corners) {
                if (rot_axis == 1)
                    nrm = Vector3(nrm[0] * c + nrm[2] * s, nrm[1],
                                  -nrm[0] * s + nrm[2] * c);
                else
                    nrm = Vector3(nrm[0], nrm[1] * c - nrm[2] * s,
                                  nrm[1] * s + nrm[2] * c);
            }
    }

    Bvh bvh;
    auto bboxes_and_centers =
        bvh::compute_bounding_boxes_and_centers(triangles.data(), triangles.size());
    auto global_bbox = bvh::compute_bounding_boxes_union(
        bboxes_and_centers.first.get(), triangles.size());
    bvh::SweepSahBuilder<Bvh> builder(bvh);
    builder.build(global_bbox, bboxes_and_centers.first.get(),
                  bboxes_and_centers.second.get(), triangles.size());

    auto pixels = std::make_unique<Scalar[]>(3 * width * height);
    auto counts = render(camera, sun_position, bvh, triangles.data(),
                         tri_norms.data(), pixels.get(), width, height);
    std::cout << "rays " << counts.first << " hits " << counts.second << std::endl;

    // Binary PPM, top-to-bottom rows as render() fills them (row j = scanline
    // j; the static app flips vertically at write time, static.cpp:135-147 —
    // the fixture keeps the raw orientation and the test flips to match).
    std::ofstream out(output, std::ios::binary);
    out << "P6\n" << width << " " << height << "\n255\n";
    for (size_t j = 0; j < height; ++j) {
        for (size_t i = 0; i < width; ++i) {
            for (int c = 0; c < 3; ++c) {
                Scalar val = pixels[3 * (width * j + i) + c];
                val = val < 0 ? 0 : (val > 1 ? 1 : val);
                out.put(static_cast<char>(static_cast<int>(val * 255.0f)));
            }
        }
    }
    std::cout << "wrote " << output << std::endl;
    return 0;
}
