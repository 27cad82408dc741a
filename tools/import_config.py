"""Import reference-format recipe YAMLs into normalized repo recipes.

The config schema is key-compatible with the reference (the compatibility
contract, config/defaults.py), so any upstream recipe merges directly.
This tool validates a recipe against the schema via merge_from_file +
assert_and_infer_cfg and re-emits ONLY the keys the recipe overrides, in
normalized sorted-section form, with a provenance header.

Usage:
  python tools/import_config.py SRC.yaml [SRC2.yaml ...] --out-dir configs/X
"""

import argparse
import os
import sys

import yaml

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from slowfast_tpu.config import get_cfg
from slowfast_tpu.config.defaults import assert_and_infer_cfg


def normalize(src_path, header_note=""):
    """Return (yaml_text, cfg) for a reference-format recipe."""
    cfg = get_cfg()
    cfg.merge_from_file(src_path)
    cfg = assert_and_infer_cfg(cfg)

    with open(src_path) as f:
        raw = yaml.safe_load(f)

    # Keep only top-level sections the recipe touches, sorted, with their
    # overridden keys sorted within.
    sections = {}
    for sec in sorted(raw.keys()):
        val = raw[sec]
        if isinstance(val, dict):
            sections[sec] = {k: val[k] for k in sorted(val)}
        else:
            sections[sec] = val

    name = os.path.basename(src_path)
    lines = [
        f"# Recipe: {os.path.splitext(name)[0]}",
        "# Reproduces the reference training recipe of the same name",
        "# (values validated against slowfast_tpu/config/defaults.py).",
    ]
    if header_note:
        lines.append(f"# {header_note}")
    body = yaml.safe_dump(
        sections, sort_keys=False, default_flow_style=None, width=78
    )
    return "\n".join(lines) + "\n" + body, cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("sources", nargs="+")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--note", default="")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for src in args.sources:
        try:
            text, _ = normalize(src, args.note)
        except Exception as e:
            print(f"SKIP {src}: {e}")
            continue
        dst = os.path.join(args.out_dir, os.path.basename(src))
        with open(dst, "w") as f:
            f.write(text)
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()
