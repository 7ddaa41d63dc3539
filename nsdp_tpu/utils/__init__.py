"""Experiment services: config, logging, metrics, mesh IO, generation."""
