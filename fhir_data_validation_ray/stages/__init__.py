"""Ray Data stages: actor-pool validators and shuffle stages."""
