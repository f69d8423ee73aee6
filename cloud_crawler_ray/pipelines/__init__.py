"""Crawl-wave driver, oracle simulator and synthetic web environment."""
