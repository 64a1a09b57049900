"""spark-submit entry point: imports the package from --py-files and runs
the pipeline CLI (tools/submit_pipeline.sh packages + submits this)."""
from recrun_spark.pipeline import main

if __name__ == "__main__":
    main()
