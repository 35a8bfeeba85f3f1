#!/usr/bin/env python3
"""Reconstruct the 1KG pipeline's staged inputs from the reference goldens.

The reference fetches three remote inputs (sample_info TSV over HTTPS, an
FTP listing, a VCF header file) that are not committed anywhere; but its
golden outputs (/root/reference/fhir_etl/oneKgenomes/META/*.ndjson) contain
every field the transforms consume, so the inputs can be rebuilt exactly:

  - fixtures/onekg_sample_info.tsv   <- Patient + Specimen goldens
  - fixtures/onekg_ftp_listing.tsv   <- DocumentReference golden
  - fixtures/onekg_vcf_header.txt    <- Group golden (member uuids inverted
                                        by re-minting all 3,500 specimen ids)

Ambiguities resolved conservatively (output-identical either way):
  - Specimen type code "Whole blood" is the null-input fallback -> blank
  - collection.method code "Not specified" is the null fallback -> blank

Run once; outputs are committed. Driver-side python (pandas not needed).
"""
import json
import os
import uuid

META = "/root/reference/fhir_etl/oneKgenomes/META"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")

THOUSAND_GENOMES = "https://ftp.1000genomes.ebi.ac.uk/vol1/ftp/"
SYSTEM = "https://" + THOUSAND_GENOMES + "technical/working/20130606_sample_info/"
NAMESPACE = uuid.uuid3(uuid.NAMESPACE_DNS, THOUSAND_GENOMES)


def mint(resource_type, value):
    return str(uuid.uuid5(NAMESPACE, f"1KG/{resource_type}/{SYSTEM}|{value}"))


def ext_value(d, url_suffix):
    for e in d.get("extension", []):
        if e["url"].endswith(url_suffix):
            return e.get("valueString", "")
    return ""


def main():
    os.makedirs(OUT, exist_ok=True)

    # ---- sample_info TSV (order = golden Patient line order) ----
    patients = [json.loads(l) for l in open(f"{META}/Patient.ndjson")]
    specimens = {s["identifier"][0]["value"]: s
                 for s in (json.loads(l) for l in open(f"{META}/Specimen.ndjson"))}
    cols = ["Sample", "Gender", "Population", "Population Description",
            "DNA Source from Coriell", "Main project LC platform"]
    with open(f"{OUT}/onekg_sample_info.tsv", "w") as f:
        f.write("\t".join(cols) + "\n")
        for p in patients:
            sample = p["identifier"][0]["value"]
            sp = specimens[sample]
            code = sp["type"]["coding"][0]["code"]
            dna = "" if code == "Whole blood" else code
            meth = sp["collection"]["method"]["coding"][0]["code"]
            platform = "" if meth == "Not specified" else meth
            row = [sample, ext_value(p, "sex.html"),
                   ext_value(p, "population.html"), ext_value(p, "race.html"),
                   dna, platform]
            assert not any("\t" in v or "\n" in v for v in row), row
            f.write("\t".join(row) + "\n")
    print(f"sample_info: {len(patients)} rows")

    # ---- FTP listing (order = golden DocumentReference line order) ----
    with open(f"{OUT}/onekg_ftp_listing.tsv", "w") as f:
        f.write("file\tsize\tlast_modified\n")
        n = 0
        for line in open(f"{META}/DocumentReference.ndjson"):
            d = json.loads(line)
            att = d["content"][0]["attachment"]
            iso = d["date"].rstrip("Z")  # parse_mdtm emitted bare ISO
            f.write(f"{d['identifier'][0]['value']}\t{att.get('size', 0)}\t{iso}\n")
            n += 1
    print(f"ftp_listing: {n} rows")

    # ---- VCF header: invert Group members by re-minting ----
    group = json.loads(open(f"{META}/Group.ndjson").read())
    member_refs = {m["entity"]["reference"] for m in group["member"]}
    samples = [p["identifier"][0]["value"] for p in patients]
    found = [s for s in samples if f"Specimen/{mint('Specimen', s)}" in member_refs]
    assert len(found) == len(member_refs), (len(found), len(member_refs))
    # add ids absent from Specimen.ndjson to exercise the J2 difference path
    missing = ["NA99901", "NA99902", "NA99903"]
    fixed = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
             "FORMAT"]
    with open(f"{OUT}/onekg_vcf_header.txt", "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        f.write("\t".join(fixed + sorted(found) + missing) + "\n")
    print(f"vcf_header: {len(found)} found + {len(missing)} planted-missing")


if __name__ == "__main__":
    main()
