"""spark-submit entry point for the extraction job.

The package itself ships on --py-files (see tools/package.py); this thin
script is the primary file spark-submit executes:

  spark-submit --py-files dist/ocr_gpu_services_spark.zip \
      tools/submit_extract.py --input <pages parquet> --out <table dir> \
      [--resume] [--run-id rN]
"""

import sys

from ocr_gpu_services_spark.plans.extract_job import main

if __name__ == "__main__":
    sys.exit(main())
