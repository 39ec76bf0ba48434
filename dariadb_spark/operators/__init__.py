"""Query operators mapping each dariadb engine verb to a DataFrame plan."""
