from icebergplus_spark.plans.audit import PlanAudit, audit, executed_plan, formatted_plan

__all__ = ["PlanAudit", "audit", "executed_plan", "formatted_plan"]
