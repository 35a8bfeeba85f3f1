#!/usr/bin/env python3
"""Reconstruct the GTEx pipeline's staged inputs from the reference goldens
(/root/reference/fhir_etl/GTEx/META), mirroring tools/make_onekg_fixtures.py.

  - fixtures/gtex_subjects.tsv   <- Patient golden (subjectId, sex,
                                    ageBracket inverted from the birth-year
                                    range ext, hardyScale from the dueto ext)
  - fixtures/gtex_filelist.json  <- DocumentReference golden, regrouped into
                                    the fileList API shape (protected fileset
                                    re-planted at index 0, which the
                                    reference drops positionally)
  - fixtures/gtex_samples.tsv    <- SYNTHETIC (Specimen.ndjson is elided
                                    upstream, see .MISSING_LARGE_BLOBS);
                                    covers null dataType / null subjectId
  - fixtures/gtex_sample_attrs.tsv <- SYNTHETIC SAMPID table for the J3
                                    intersection (3 matches + 2 misses)

Also prints the distinct golden contentTypes so the Scala mime table can be
checked against exactly what the reference emitted.
"""
import json
import os

META = "/root/reference/fhir_etl/GTEx/META"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")


def ext_map(d):
    out = {}
    for e in d.get("extension", []):
        out[e["url"]] = e.get("valueString")
    return out


def main():
    os.makedirs(OUT, exist_ok=True)

    # ---- subjects TSV (order = golden Patient order) ----
    pats = [json.loads(l) for l in open(f"{META}/Patient.ndjson")]
    with open(f"{OUT}/gtex_subjects.tsv", "w") as f:
        f.write("subjectId\tsex\tageBracket\thardyScale\n")
        for p in pats:
            em = ext_map(p)
            sex = em.get("https://hl7.org/fhir/us/core/STU3.1.1/StructureDefinition-us-core-sex.html", "")
            hardy = em.get("https://hl7.org/fhir/R4B/extension-condition-dueto.html", "")
            age = em.get("https://hl7.org/fhir/extensions/SearchParameter-patient-extensions-Patient-age.html")
            if age:  # "1956 - 1965" = {2025-hi} - {2025-lo}  ->  "60-69"
                a, b = [int(x) for x in age.split(" - ")]
                bracket = f"{2025 - b}-{2025 - a}"
            else:
                bracket = ""
            f.write("\t".join([p["identifier"][0]["value"], sex, bracket,
                               hardy]) + "\n")
    print(f"subjects: {len(pats)}")

    # ---- fileList JSON (regroup docrefs by fileset in appearance order) ----
    docs = [json.loads(l) for l in open(f"{META}/DocumentReference.ndjson")]
    filesets, by_subpath, ctypes = [], {}, set()
    for d in docs:
        vc = d["content"][0]["profile"][0]["valueCoding"]
        ctypes.add(d["content"][0]["attachment"]["contentType"])
        # two filesets can share a subpath with different display names
        # (single_tissue_qtl_data appears twice) — key by both
        key = (vc["code"], vc["display"])
        if key not in by_subpath:
            fs = {"name": vc["display"], "subpath": vc["code"], "files": []}
            by_subpath[key] = fs
            filesets.append(fs)
        em = ext_map(d)
        by_subpath[key]["files"].append({
            "name": d["identifier"][0]["value"],
            "type": d["type"]["coding"][0]["code"],
            "size": em["https://nih-ncpi.github.io/ncpi-fhir-ig-2/StructureDefinition-file-size.html"],
            "release": d["version"]})
    payload = [{"name": "GTEx Analysis V8",
                "filesets": [{"name": "Protected Data", "subpath": "protected",
                              "files": []}] + filesets},
               {"name": "Some Other Release", "filesets": []}]
    with open(f"{OUT}/gtex_filelist.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(f"docrefs: {len(docs)} in {len(filesets)} filesets; contentTypes: {sorted(ctypes)}")

    # ---- synthetic samples + sample attributes (no golden exists) ----
    with open(f"{OUT}/gtex_samples.tsv", "w") as f:
        f.write("aliquotId\tsubjectId\tdataType\tfreezeType\n")
        f.write("SM-0001\tGTEX-1117F\tRNA-Seq\tFrozen\n")
        f.write("SM-0002\tGTEX-1117F\t\tFrozen\n")        # null dataType
        f.write("SM-0003\tGTEX-ZZZZ\tWGS\tFresh\n")
        f.write("SM-0004\t\tWGS\tFresh\n")                # null subjectId
        f.write("SM-0005\tGTEX-AAAA\tExome\tFrozen\n")
    with open(f"{OUT}/gtex_sample_attrs.tsv", "w") as f:
        f.write("SAMPID\tSMTS\n")
        f.write("GTEX-1117F-0003-SM-0001\tBlood\n")       # match
        f.write("GTEX-1117F-0004-SM-0002\tBlood\n")       # match
        f.write("GTEX-ZZZZ-0001-SM-0003\tBrain\n")        # match
        f.write("GTEX-MISS-0001-SM-9998\tLung\n")         # miss
        f.write("GTEX-MISS-0002-SM-9999\tLung\n")         # miss
    print("samples: 5 synthetic, attrs: 3 matches + 2 misses")

    # ---- paginated subject API envelopes (S3 fixture: 100 items/page,
    # the reference's itemsPerPage, gtex_fhirizer.py:61) ----
    page_dir = f"{OUT}/gtex_subject_pages"
    os.makedirs(page_dir, exist_ok=True)
    for f0 in os.listdir(page_dir):
        os.remove(os.path.join(page_dir, f0))
    records = []
    for p in pats:
        em = ext_map(p)
        age = em.get("https://hl7.org/fhir/extensions/SearchParameter-patient-extensions-Patient-age.html")
        if age:
            a, b = [int(x) for x in age.split(" - ")]
            bracket = f"{2025 - b}-{2025 - a}"
        else:
            bracket = None
        records.append({
            "subjectId": p["identifier"][0]["value"],
            "sex": em.get("https://hl7.org/fhir/us/core/STU3.1.1/StructureDefinition-us-core-sex.html"),
            "ageBracket": bracket,
            "hardyScale": em.get("https://hl7.org/fhir/R4B/extension-condition-dueto.html")})
    per, n_pages = 100, (len(records) + 99) // 100
    for i in range(n_pages):
        with open(f"{page_dir}/page-{i:04d}.json", "w") as f:
            json.dump({"data": records[i * per:(i + 1) * per],
                       "paging_info": {"numberOfPages": n_pages, "page": i,
                                       "totalNumberOfItems": len(records)}}, f)
    print(f"subject pages: {n_pages} x <= {per}")


if __name__ == "__main__":
    main()
