"""Fetch the demo dataset zips (parity with
/root/reference/download_demo_datasets.py, which uses gdown on Google Drive).

This environment has no egress; the script verifies/unpacks local archives if
present and otherwise prints the expected layout.
"""
import argparse
import zipfile
from pathlib import Path

EXPECTED = {
    "datasets/DTU": ["Cameras", "Rectified"],
    "datasets/TanksAndTemples": ["tankandtemples", "training_input"],
}


def unpack(archive: Path, dest: Path):
    dest.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(archive) as z:
        z.extractall(dest)
    print(f"unpacked {archive} -> {dest}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--archives", default="archives",
                        help="directory containing pre-downloaded demo zips")
    args = parser.parse_args()

    arch_dir = Path(args.archives)
    if arch_dir.is_dir():
        for z in sorted(arch_dir.glob("*.zip")):
            unpack(z, Path("datasets"))

    ok = True
    for root, subdirs in EXPECTED.items():
        for sub in subdirs:
            p = Path(root) / sub
            status = "ok" if p.is_dir() else "MISSING"
            if not p.is_dir():
                ok = False
            print(f"{p}: {status}")
    if not ok:
        print("\nPlace the demo archives (DTU sample scans, TNT "
              "Ignatius/Meetingroom) under ./archives or arrange the layout "
              "above manually; see the reference README for sources.")
