from .routing import extract_years_from_question, route_mask
