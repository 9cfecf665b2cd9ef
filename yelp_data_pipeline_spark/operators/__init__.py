"""Operator inventory (SURVEY.md §2) as reusable DataFrame→DataFrame
functions, generic over column names so the same code runs on
Yelp-shaped inputs and the driver's TPC-H-ish fixtures."""
