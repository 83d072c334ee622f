"""CLI driver — the reference's ``main.cpp`` equivalent.

Reads a JSON config (default ``config/config.json``, src/main.cpp:63-67),
configures logging (:49-55), loads camera intrinsics from the OpenCV-YAML file
named in the config, lists and sorts the image folder (:94-96), then loops:
decode grayscale → ``System.add_image`` → append pose or "Failed"
(:102-130). Writes KITTI-format poses + per-frame metrics JSONL at the end.

Usage:  python -m sdvo_tpu.main [config.json] [--images DIR] [--output DIR]
        [--max-frames N] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native semi-direct visual odometry")
    parser.add_argument("config", nargs="?", default="config/config.json")
    parser.add_argument("--images", default=None, help="override image_data_path")
    parser.add_argument("--output", default=None, help="override output dir")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--f64", action="store_true", help="float64 compute (CPU parity mode)")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    from sdvo_tpu.config import load_config
    from sdvo_tpu.dataio.datasets import list_image_files, load_camera_yaml, load_image_grayscale
    from sdvo_tpu.geometry.camera import PinholeCamera
    from sdvo_tpu.pipeline.system import FrameResult, System
    from sdvo_tpu.utils.logging import configure_logging, get_logger, write_metrics_jsonl

    configure_logging(level=logging.DEBUG if args.verbose else logging.INFO)
    log = get_logger("Main")

    config = load_config(args.config)
    if args.f64:
        config = config.replace(compute_dtype="float64")
    image_dir = args.images or config.file_paths.image_data_path
    out_dir = args.output or config.file_paths.output_dir
    os.makedirs(out_dir, exist_ok=True)

    import jax.numpy as jnp

    dtype = jnp.float64 if config.compute_dtype == "float64" else jnp.float32
    calib = config.file_paths.camera_calibration_file
    if calib and os.path.exists(calib):
        K, d = load_camera_yaml(calib)
        camera = PinholeCamera.create(
            K[0, 0], K[1, 1], K[0, 2], K[1, 2],
            config.camera.img_width, config.camera.img_height, dist=d, dtype=dtype,
        )
        log.info("camera: fx=%.3f cx=%.3f cy=%.3f", K[0, 0], K[0, 2], K[1, 2])
    else:
        camera = None
        log.warning("no calibration file at %s — using KITTI defaults", calib)

    system = System(config, camera=camera)
    files = list_image_files(image_dir)
    if args.max_frames:
        files = files[: args.max_frames]
    log.info("processing %d frames from %s", len(files), image_dir)

    t0 = time.perf_counter()
    for i, path in enumerate(files):
        img = load_image_grayscale(path)
        result = system.add_image(img, float(i))
        if result == FrameResult.FAILED:
            log.warning("frame %d (%s): FAILED", i, os.path.basename(path))
        elif args.verbose:
            log.debug("frame %d: %s", i, result.name)
    wall = time.perf_counter() - t0

    pose_path = os.path.join(out_dir, "out.txt")
    system.write_poses(pose_path)
    write_metrics_jsonl(os.path.join(out_dir, "metrics.jsonl"), system.metrics)
    log.info(
        "done: %d frames in %.1fs (%.1f fps) → %s", len(files), wall,
        len(files) / max(wall, 1e-9), pose_path,
    )
    log.info("timers:\n%s", system.timers.report())
    print(system.report_summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
