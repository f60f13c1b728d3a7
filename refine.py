"""Standalone stage-2 VCR refinement entry — CLI-compatible with the
reference's refine script (reference:
threestudio/models/guidance/refine.py:241-332):

  python refine.py --config_path configs/exp.yaml --log_path logs \
      --cur_time <id> --pil_image_path assets/audrey.png --prompt "..."

Thin wrapper over the in-process stage-2 path (launch.run_stage2); unlike the
reference it does NOT rewrite the config file — stage progress lives in the
run manifest."""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default="configs/exp.yaml")
    parser.add_argument("--log_path", default="logs")
    parser.add_argument("--cur_time", required=True)
    parser.add_argument("--pil_image_path", default=None)
    parser.add_argument("--prompt", default=None)
    parser.add_argument("--stub-guidance", action="store_true")
    parser.add_argument("--devices", default="auto",
                        help="data-mesh size: auto / 1 / explicit count")
    args, extras = parser.parse_known_args()

    from gaussianip_tpu.utils.config import load_config
    from gaussianip_tpu.utils.saving import RunDirs
    import launch

    overrides = list(extras)
    if args.prompt:
        overrides.append(f"system.prompt_processor.prompt={args.prompt}")
    if args.pil_image_path:
        overrides.append(
            f"system.guidance.pil_image_faceid_path={args.pil_image_path}")
    overrides.append(f"system.log_path={args.log_path}")
    cfg = load_config(args.config_path, *overrides)
    dirs = RunDirs(args.log_path, args.cur_time)

    class _A:
        stub_guidance = args.stub_guidance
        max_steps = None
        devices = args.devices

    launch.run_stage2(cfg, dirs, _A())


if __name__ == "__main__":
    main()
