from data_warehouse_migrate_spark.plans.dryrun import explain_plan, plan_report

__all__ = ["explain_plan", "plan_report"]
