# plan-inspection utilities (explain-driven assertions)
