"""Extract per-dataset label tables from the reference readers into JSON.

The reference embeds a `labels_info` list (id / trainId / name / color) in
each per-dataset reader module (e.g. lib/cityscapes_cv2.py:19,
lib/CamVid_lb.py:55, lib/Mapi.py:147, lib/sunrgbd.py:19, lib/bdd100k_data.py:20,
lib/idd_cv2.py:64, lib/ade2016_data.py:20, lib/coco_data.py:19, lib/WD2.py:19,
lib/scannet.py:19) and builds a 256-entry id→trainId LUT in each reader's
__init__. These tables are dataset facts, not code; we extract them once into
`mds_tpu/data/label_specs.json` so the rebuilt pipeline carries no torch/cv2
dependency and no reference code.

Run: python tools/gen_label_specs.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import re

# dataset key -> (module file, labels_info variable, eval n_cats, mean, std)
# n_cats and mean/std transcribed from each reader's __init__ (see file:line
# citations in the docstring). Most datasets share the city rgb stats.
CITY_MEAN = [0.3038, 0.3383, 0.3034]
CITY_STD = [0.2071, 0.2088, 0.2090]

SPECS = {
    "cityscapes": ("lib/cityscapes_cv2.py", "labels_info", 19, CITY_MEAN, CITY_STD),
    "camvid": ("lib/CamVid_lb.py", "labels_info_eval", 11, CITY_MEAN, CITY_STD),
    "a2d2": ("lib/a2d2_lb_cv2.py", "labels_info", 36, CITY_MEAN, CITY_STD),
    "mapillary": ("lib/Mapi.py", "labels_info_v12", 64, CITY_MEAN, CITY_STD),
    "sunrgbd": ("lib/sunrgbd.py", "labels_info", 37, CITY_MEAN, CITY_STD),
    "bdd100k": ("lib/bdd100k_data.py", "labels_info", 19, CITY_MEAN, CITY_STD),
    "idd": ("lib/idd_cv2.py", "labels_info", 26, CITY_MEAN, CITY_STD),
    "ade20k": ("lib/ade2016_data.py", "labels_info", 150, CITY_MEAN, CITY_STD),
    "cocostuff": ("lib/coco_data.py", "labels_info", 133, CITY_MEAN, CITY_STD),
    "wilddash2": ("lib/WD2.py", "labels_info", 25, CITY_MEAN, CITY_STD),
    "scannet": ("lib/scannet.py", "labels_info", 20, CITY_MEAN, CITY_STD),
    # MSeg relabeled taxonomies (the *_mseg reader variants; tsv remaps at
    # the reference root, embedded as mseg_labels_info lists in the readers)
    "mapillary_mseg": ("lib/Mapi.py", "mseg_labels_info", 43, CITY_MEAN, CITY_STD),
    "ade20k_mseg": ("lib/ade2016_data.py", "Mseg_label_info", 117, CITY_MEAN, CITY_STD),
    "cocostuff_mseg": ("lib/coco_data.py", "mseg_labels_info", 122, CITY_MEAN, CITY_STD),
}


def extract_assign(path: str, varname: str):
    """Return the literal value of a top-level assignment `varname = [...]`."""
    with open(path, "r") as f:
        tree = ast.parse(f.read())
    ns = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            tgt = node.targets[0]
            if isinstance(tgt, ast.Name):
                try:
                    ns[tgt.id] = ast.literal_eval(node.value)
                except ValueError:
                    # e.g. `labels_info = labels_info_v12` alias
                    if isinstance(node.value, ast.Name) and node.value.id in ns:
                        ns[tgt.id] = ns[node.value.id]
    if varname not in ns:
        raise KeyError(f"{varname} not found in {path}")
    return ns[varname]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "mds_tpu", "data", "label_specs.json"),
    )
    args = ap.parse_args()

    out = {}
    for name, (rel, var, n_cats, mean, std) in SPECS.items():
        path = os.path.join(args.reference, rel)
        info = extract_assign(path, var)
        entries = []
        for el in info:
            entries.append(
                {
                    "id": int(el["id"]),
                    "trainId": int(el["trainId"]),
                    "name": str(el.get("name", el.get("en_name", ""))),
                    "color": list(el["color"]) if "color" in el else None,
                }
            )
        out[name] = {
            "n_cats": n_cats,
            "mean": mean,
            "std": std,
            "labels_info": entries,
            "source": f"{rel}:{var}",
        }
        print(f"{name}: {len(entries)} label entries, n_cats={n_cats}")

    with open(os.path.abspath(args.out), "w") as f:
        json.dump(out, f)
    print(f"wrote {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
