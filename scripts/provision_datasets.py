"""Provision (download-or-verify) the benchmark datasets into the cache.

Makes real-data parity one command away on any networked machine
(`make provision && make parity`); on air-gapped machines, run it where
the network exists and copy the cache directory (default ``~/.cymf_tpu``,
override with ``CYMF_TPU_CACHE``) across.

  python scripts/provision_datasets.py                 # ml-100k + ml-1m
  python scripts/provision_datasets.py ml-20m text8
  python scripts/provision_datasets.py --verify-only   # no network needed

Each dataset is verified STRUCTURALLY after extraction (known record
counts — the loaders' ground truth; no checksum database is needed
offline), into the layout the loaders expect:

  ~/.cymf_tpu/ml-100k/u.data            (MovieLens loaders)
  ~/.cymf_tpu/ml-1m/ratings.dat
  ~/.cymf_tpu/ml-20m/ratings.csv
  ~/.cymf_tpu/text8                     (Text8 corpus, raw file)

YahooMusic R3 requires a manual Webscope request (no public URL); this
script only verifies it when present (``~/.cymf_tpu/yahoo-r3/
ydata-ymusic-rating-study-v1_0-train.txt`` + ``...-test.txt``).
"""

from __future__ import annotations

import argparse
import sys
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cymf_tpu.dataset.implicit import cache_root  # noqa: E402

# Structural expectations: exact published record counts (rating lines,
# incl. header lines for the csv formats) or byte sizes.
DATASETS = {
    "ml-100k": dict(
        url="https://files.grouplens.org/datasets/movielens/ml-100k.zip",
        probe="ml-100k/u.data", kind="zip", lines=100_000),
    "ml-1m": dict(
        url="https://files.grouplens.org/datasets/movielens/ml-1m.zip",
        probe="ml-1m/ratings.dat", kind="zip", lines=1_000_209),
    "ml-10m": dict(
        url="https://files.grouplens.org/datasets/movielens/ml-10m.zip",
        probe="ml-10m/ratings.dat", kind="zip", extracted="ml-10M100K",
        lines=10_000_054),
    "ml-20m": dict(
        url="https://files.grouplens.org/datasets/movielens/ml-20m.zip",
        probe="ml-20m/ratings.csv", kind="zip", lines=20_000_264),
    "ml-25m": dict(
        url="https://files.grouplens.org/datasets/movielens/ml-25m.zip",
        probe="ml-25m/ratings.csv", kind="zip", lines=25_000_096),
    "text8": dict(
        url="http://mattmahoney.net/dc/text8.zip",
        probe="text8", kind="zip", bytes=100_000_000),
    "yahoo-r3": dict(
        url=None, kind="manual",
        probe="yahoo-r3/ydata-ymusic-rating-study-v1_0-train.txt"),
}
DEFAULT = ["ml-100k", "ml-1m"]


def _verify(path: Path, spec: dict, name: str) -> bool:
    if "bytes" in spec:
        got = path.stat().st_size
        if got != spec["bytes"]:
            print(f"[fail] {name}: {path} is {got} bytes, expected "
                  f"{spec['bytes']}")
            return False
    if "lines" in spec:
        got = 0
        with path.open("rb") as f:
            for chunk in iter(lambda: f.read(1 << 22), b""):
                got += chunk.count(b"\n")
        if got != spec["lines"]:
            print(f"[fail] {name}: {path} has {got} lines, expected "
                  f"{spec['lines']}")
            return False
    print(f"[ok] {name}: {path} verified")
    return True


def provision(name: str, root: Path, verify_only: bool) -> bool:
    spec = DATASETS[name]
    probe = root / spec["probe"]
    if probe.exists():
        return _verify(probe, spec, name)
    if spec["kind"] == "manual":
        print(f"[skip] {name}: manual download required (Yahoo Webscope "
              f"R3) -> place files under {probe.parent}/")
        return False

    zip_path = root / (name + ".zip")
    if not zip_path.exists():
        if verify_only:
            print(f"[missing] {name}: no files and --verify-only set")
            return False
        import urllib.request
        print(f"[get] {name}: {spec['url']}")
        try:
            urllib.request.urlretrieve(spec["url"], str(zip_path))
        except Exception as e:  # no network: report, keep going
            print(f"[fail] {name}: download failed ({e})")
            return False
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(root)
    extracted = root / spec.get("extracted", name)
    want = root / name
    if extracted != want and extracted.exists() and not want.exists():
        extracted.rename(want)
    if not probe.exists():
        print(f"[fail] {name}: extraction did not produce {probe}")
        return False
    return _verify(probe, spec, name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None,
                    help=f"datasets to provision (default: {DEFAULT}; "
                         f"known: {sorted(DATASETS)})")
    ap.add_argument("--verify-only", action="store_true",
                    help="never touch the network; report what is present")
    args = ap.parse_args()
    names = args.names or DEFAULT
    root = cache_root()
    print(f"cache root: {root}")
    results = {n: provision(n, root, args.verify_only) for n in names}
    missing = [n for n, ok in results.items() if not ok]
    if missing:
        print(f"\nnot provisioned: {missing}")
        raise SystemExit(1)
    print("\nall requested datasets provisioned")


if __name__ == "__main__":
    main()
