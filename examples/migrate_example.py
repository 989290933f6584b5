"""Python-API example mirroring the reference's examples/migrate_example.py:
construct a job, dry-run it (explain + schema preview), then run it.

Run: python examples/migrate_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_migrate_spark.config import load_config_file, merge_config
from data_warehouse_migrate_spark.migrate import job_from_config
from data_warehouse_migrate_spark.session import get_spark


def main() -> None:
    cfg = merge_config(cli_args={}, file_cfg=load_config_file(
        "examples/migration_config.json"))
    job = job_from_config(cfg)
    spark = get_spark("migrate-example")
    report = job.dry_run(spark)   # plan only: probe + schema + mapping + plan
    print({k: v for k, v in report.items() if k != "physical_plan"})
    result = job.run(spark)       # the actual migration
    print(result)
    spark.stop()


if __name__ == "__main__":
    main()
