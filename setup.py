from setuptools import setup, find_packages
setup(name="supereight_tpu", version="0.1.0", packages=find_packages())
