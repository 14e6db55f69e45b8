"""Deterministic gVCF-shaped fixture generator (shared by tests, the
rows-only file-source queries, and the bulk-parse benchmark). Content
depends only on the arguments — regenerating is idempotent."""

from __future__ import annotations

import gzip
import os
import tempfile

ANN_FIXTURE = (
    "G|missense_variant|MODERATE|GENE1|G1|transcript|TX000001|"
    "protein_coding|3/10|c.1A>G|p.Thr2Ala|10/1000|2/500|100/333|x"
    ",G|stop_gained|HIGH|GENE1|G1|transcript|TX000001|pc|3/10|c|p|1/2|2/5|10/30|x"
)


def vcf_fixture_dir(n_samples: int = 2, n_sites: int = 30, tag: str = "v1") -> str:
    """Write (once) n_samples gzipped gVCF-ish files with a deterministic
    mix of annotated variant sites and <NON_REF> reference blocks."""
    d = os.path.join(
        tempfile.gettempdir(), f"genpipe_vcf_{n_samples}x{n_sites}_{tag}"
    )
    if os.path.isdir(d):
        return d
    # atomic publish: build in a scratch dir, rename into place (concurrent
    # callers must never observe partially written fixtures)
    tmp = tempfile.mkdtemp(dir=tempfile.gettempdir())
    for s in range(n_samples):
        with gzip.open(os.path.join(tmp, f"SAMPLE{s}.vcf.gz"), "wt") as fh:
            fh.write("##fileformat=VCFv4.1\n#CHROM\tPOS\n")
            for i in range(n_sites):
                pos = 1000 + 10 * i
                chrom = str(i % 22 + 1)
                if i % 5 == s % 5:
                    info = (
                        "dbNSFP_SIFT_pred=D;CADD13_PHRED=10.5;"
                        f"dbNSFP_1000Gp1_AF=0.68271;ANN={ANN_FIXTURE}"
                    )
                    fh.write(
                        f"{chrom}\t{pos}\t.\tA\tG,<NON_REF>\t100\tPASS\t{info}"
                        f"\tGT:AD:DP:GQ:PL:SB\t0/1:7,3:30:80:58,0:1,2\n"
                    )
                else:
                    fh.write(
                        f"{chrom}\t{pos}\t.\tC\t<NON_REF>\t100\tPASS\tEND={pos + 9}"
                        f"\tGT:DP:GQ:MIN_DP:PL\t0/0:40:60:35:0,0\n"
                    )
    try:
        os.rename(tmp, d)
    except OSError:
        pass  # another process published first; theirs is identical
    return d
