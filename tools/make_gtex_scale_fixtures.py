#!/usr/bin/env python3
"""Synthesize the GTEx sample fixtures at GOLDEN SCALE.

The reference's GTEx Specimen golden is a 43,559-row NDJSON elided
upstream (/root/reference/.MISSING_LARGE_BLOBS), so the committed 5-row
fixtures never exercise the Group's 43,559-member collect-to-array (A5)
or the SAMPID-strip intersection (J3/F7) at their real cardinality.
This script writes deterministic full-scale stand-ins:

  fixtures/gtex_samples_full.tsv       43,559 + 150 samples-only rows
  fixtures/gtex_sample_attrs_full.tsv  43,559 + 200 attrs-only rows

Exactly the 43,559 shared ids survive the strip+intersection, matching
the golden Specimen/Group cardinality (README.md:38). Both overlap
tails exist so the semi-join actually excludes rows on each side.
Deterministic output — no randomness; safe to re-run.
"""
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
N_SHARED = 43559
N_SAMPLES_ONLY = 150
N_ATTRS_ONLY = 200
N_SUBJECTS = 980

DATA_TYPES = ["RNA-Seq", "WGS", "", "WES"]  # "" -> null -> 'None' coalesce
FREEZE_TYPES = ["Frozen", "Fresh", "PAXgene"]
TISSUES = ["Blood", "Brain", "Liver", "Lung", "Muscle", "Skin"]


def subject(i: int) -> str:
    return f"GTEX-S{i % N_SUBJECTS:04d}"


def main() -> None:
    samples_path = os.path.join(ROOT, "gtex_samples_full.tsv")
    with open(samples_path, "w") as f:
        f.write("aliquotId\tsubjectId\tdataType\tfreezeType\n")
        for i in range(N_SHARED):
            f.write(f"SM-{i:06d}\t{subject(i)}\t"
                    f"{DATA_TYPES[i % len(DATA_TYPES)]}\t"
                    f"{FREEZE_TYPES[i % len(FREEZE_TYPES)]}\n")
        for i in range(N_SAMPLES_ONLY):  # never in attrs -> excluded
            f.write(f"SM-X{i:05d}\t{subject(i)}\tRNA-Seq\tFrozen\n")

    attrs_path = os.path.join(ROOT, "gtex_sample_attrs_full.tsv")
    with open(attrs_path, "w") as f:
        f.write("SAMPID\tSMTS\n")
        for i in range(N_SHARED):
            # strip keeps the last two dash tokens -> "SM-<i:06d>"
            f.write(f"{subject(i)}-0003-SM-{i:06d}\t"
                    f"{TISSUES[i % len(TISSUES)]}\n")
        for i in range(N_ATTRS_ONLY):  # never in samples -> excluded
            f.write(f"{subject(i)}-0003-SM-Z{i:05d}\t"
                    f"{TISSUES[i % len(TISSUES)]}\n")

    print(f"wrote {samples_path} ({N_SHARED + N_SAMPLES_ONLY} rows)")
    print(f"wrote {attrs_path} ({N_SHARED + N_ATTRS_ONLY} rows)")


if __name__ == "__main__":
    main()
