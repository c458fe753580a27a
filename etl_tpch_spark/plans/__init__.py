from .audit import assert_plan, explain_text, plan_features

__all__ = ["assert_plan", "explain_text", "plan_features"]
