"""Data-plane batch transforms: parse, classify, enrich, route, aggregate."""
