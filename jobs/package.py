"""Build the --py-files zip for spark-submit."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out="parsee_pdf_reader_spark.zip"):
    pkg = os.path.join(ROOT, "parsee_pdf_reader_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
