#!/usr/bin/env python3
"""Capture the reference serializer's JSON views by RUNNING the reference's
own serialize() code (/root/reference/dask_geomodeling/core/graphs.py)
against the five fixture graphs in src/test/resources/reference_views/.

The reference's C-extension stack (gdal/scipy/pyproj/geopandas) is not
installable here (zero egress — pip DNS fails), so those modules are
MagicMock-stubbed at import time; `dask.base.tokenize` is replaced with an
md5-of-repr stand-in that satisfies the 32-hex token contract. The
resulting JSON therefore has REAL reference structure (version / graph /
name nesting, import paths, argument encodings — all produced by
graphs.py) with SYNTHETIC token suffixes, which is exactly what the
fixtures assert (their tokens are hand-made hex too).

Output: /tmp/captured_views/*.json plus a structural diff against the
committed fixtures (tokens canonicalized away).
"""
import hashlib
import json
import os
import re
import sys
import types
from unittest import mock

# ---------------------------------------------------------------- stubs


def install_stubs():
    dask = types.ModuleType('dask')
    dask_base = types.ModuleType('dask.base')

    def tokenize(*args, **kwargs):
        return hashlib.md5(
            repr((args, sorted(kwargs.items()))).encode()).hexdigest()

    def normalize_token(x):
        return x
    normalize_token.register = lambda *a, **k: (lambda f: f)
    dask_base.tokenize = tokenize
    dask_base.normalize_token = normalize_token
    dask_base.get_scheduler = lambda *a, **k: None
    dask_local = types.ModuleType('dask.local')

    def get_sync(graph, keys, **kw):
        raise NotImplementedError('compute not supported in capture')
    dask_local.get_sync = get_sync
    dask_config = types.ModuleType('dask.config')
    _cfg = {}

    class _SetCtx:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False
    dask_config.set = _SetCtx
    dask_config.get = lambda key, default=None: _cfg.get(key, default)
    dask_config.config = _cfg
    dask_config.update_defaults = lambda d: _cfg.update(d)
    dask.base = dask_base
    dask.local = dask_local
    dask.config = dask_config
    sys.modules['dask'] = dask
    sys.modules['dask.base'] = dask_base
    sys.modules['dask.local'] = dask_local
    sys.modules['dask.config'] = dask_config

    for name in ['osgeo', 'osgeo.gdal', 'osgeo.ogr', 'osgeo.osr',
                 'osgeo.gdal_array', 'scipy', 'scipy.ndimage',
                 'pyproj', 'pyproj.exceptions', 'geopandas',
                 'pyogrio', 'fiona', 'rtree']:
        sys.modules[name] = mock.MagicMock(name=name)

    shapely = types.ModuleType('shapely')
    shp_geom = types.ModuleType('shapely.geometry')
    shp_base = types.ModuleType('shapely.geometry.base')

    class BaseGeometry:
        pass

    class Point(BaseGeometry):
        def __init__(self, *a):
            self.a = a

    shp_base.BaseGeometry = BaseGeometry
    shp_geom.base = shp_base
    shp_geom.box = lambda *a, **k: BaseGeometry()
    shp_geom.Point = Point
    shp_ops = types.ModuleType('shapely.ops')
    shp_ops.transform = lambda f, g: g
    shp_errors = types.ModuleType('shapely.errors')

    class GEOSException(Exception):
        pass
    shp_errors.GEOSException = GEOSException
    shp_errors.ShapelyError = GEOSException
    shp_errors.WKTReadingError = GEOSException
    shp_wkt = types.ModuleType('shapely.wkt')
    shp_wkt.loads = lambda s: BaseGeometry()
    shp_wkt.dumps = lambda g: 'GEOMETRYCOLLECTION EMPTY'
    shp_prep = types.ModuleType('shapely.prepared')
    shp_prep.prep = lambda g: g
    shp_geom.shape = lambda d: BaseGeometry()
    shp_geom.mapping = lambda g: {}
    shp_geom.GeometryCollection = BaseGeometry
    shp_geom.Polygon = BaseGeometry
    shp_geom.MultiPolygon = BaseGeometry
    shp_geom.LineString = BaseGeometry
    shapely.geometry = shp_geom
    shapely.ops = shp_ops
    shapely.errors = shp_errors
    shapely.wkt = shp_wkt
    shapely.prepared = shp_prep
    shapely.Point = Point
    shapely.box = shp_geom.box
    # mark stubs as packages so `from shapely.<sub> import x` resolves
    for pkg in (shapely, shp_geom):
        pkg.__path__ = []
    sys.modules['shapely'] = shapely
    sys.modules['shapely.geometry'] = shp_geom
    sys.modules['shapely.geometry.base'] = shp_base
    sys.modules['shapely.ops'] = shp_ops
    sys.modules['shapely.errors'] = shp_errors
    sys.modules['shapely.wkt'] = shp_wkt
    sys.modules['shapely.prepared'] = shp_prep


# ------------------------------------------------------------- fixtures


def build_graphs():
    """The five fixture graphs, re-expressed through the reference API."""
    from dask_geomodeling.raster.sources import RasterFileSource
    from dask_geomodeling.raster import elemwise, misc, temporal, spatial, combine
    from dask_geomodeling.geometry import sources as gsources
    from dask_geomodeling.geometry import merge as gmerge
    from dask_geomodeling.geometry import field_operations as gfield
    from dask_geomodeling.geometry import geom_operations as ggeom
    from dask_geomodeling.geometry import set_operations as gset  # noqa: F401
    from dask_geomodeling.geometry.base import SetSeriesBlock
    from dask_geomodeling.geometry import aggregate as gagg

    views = {}

    # elemwise_chain: Multiply(MaskBelow(Add(tif, 10), 2), 0.5)
    rain = RasterFileSource('/data/rain.tif')
    views['elemwise_chain'] = elemwise.Multiply(
        misc.MaskBelow(elemwise.Add(rain, 10.0), 2.0), 0.5)

    # temporal_group: TemporalAggregate(Group(gauge, Snap(TemporalSum(
    #   Shift(radar, 300000)), gauge)), "D", "mean")
    radar = RasterFileSource('/data/radar.tif')
    gauge = RasterFileSource('/data/gauge.tif', time_delta=3600000)
    views['temporal_group'] = temporal.TemporalAggregate(
        combine.Group(gauge, temporal.Snap(
            temporal.TemporalSum(temporal.Shift(radar, 300000)), gauge)),
        'D', statistic='mean')

    # geometry_merge: SetSeriesBlock(Merge(parcels.gpkg, buildings.shp,
    #   "left"), "area", Area(merge, "EPSG:28992"))
    parcels = gsources.GeometryFileSource('/data/parcels.gpkg', layer='parcels')
    buildings = gsources.GeometryFileSource('/data/buildings.shp')
    merged = gmerge.MergeGeometryBlocks(
        parcels, buildings, how='left', suffixes=('', '_b'))
    views['geometry_merge'] = SetSeriesBlock(
        merged, 'area', ggeom.Area(merged, 'EPSG:28992'))

    # place_shared_depths: Group(dem, Shift(dem, 300000),
    #   Place(dem, "EPSG:28992", (135001, 455999), [two points], "max"))
    dem = RasterFileSource('/data/dem.tif')
    views['place_shared_depths'] = combine.Group(
        dem, temporal.Shift(dem, 300000),
        spatial.Place(dem, 'EPSG:28992', (135001.0, 455999.0),
                      [(135002.0, 455999.0), (135003.5, 455998.5)], 'max'))

    # zonal_classify: SetSeriesBlock(agg, "class", Classify(
    #   GetSeriesBlock(agg, "agg"), bins, labels)) over a WKT zone source
    from dask_geomodeling.geometry.base import GetSeriesBlock
    zone = gsources.GeometryWKTSource(
        'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', 'EPSG:28992')
    zdem = RasterFileSource('/data/dem.tif')
    agg = gagg.AggregateRaster(zone, zdem, statistic='mean',
                               projection='EPSG:28992', pixel_size=1.0,
                               max_pixels=640000, column_name='agg')
    cls = gfield.Classify(GetSeriesBlock(agg, 'agg'),
                          [1.0, 5.0, 25.0], ['low', 'mid', 'high', 'top'])
    views['zonal_classify'] = SetSeriesBlock(agg, 'class', cls)

    # rasterize_focal: HillShade(Smooth(Dilate(Reclassify(Rasterize(land,
    #   'class', 'int32'), [[1,10],[2,20]], select), [10]), 50, fill=5),
    #   30, 200, 1) — pins Rasterize's null limit, Reclassify's
    #   nested-list data + select flag, Dilate's values list, Smooth's
    #   fill, HillShade's float coercions
    land = gsources.GeometryFileSource('/data/land.gpkg')
    rz = misc.Rasterize(land, column_name='class', dtype='int32')
    rc = misc.Reclassify(rz, data=[[1, 10.0], [2, 20.0]], select=True)
    views['rasterize_focal'] = spatial.HillShade(
        spatial.Smooth(spatial.Dilate(rc, values=[10.0]), 50.0, fill=5.0),
        30.0, 200.0, 1.0)

    # geometry_field_chain: SetSeriesBlock with TWO (column, value) pairs
    # over ClassifyFromColumns (column-name bins, right=False) and
    # Round(Where(value, cond, other)) — pins the variadic pair
    # encoding and the field-op argument orders
    # GetSeriesBlock validates against source.columns, which probes the
    # file via pyogrio.read_info — give the mocked probe our columns
    gsources.read_info = lambda path, layer=None: {
        'fields': types.SimpleNamespace(
            tolist=lambda: ['value', 'flag', 'lo', 'hi'])}
    zones = gsources.GeometryFileSource('/data/zones.gpkg', layer='zones')
    val = GetSeriesBlock(zones, 'value')
    flag = GetSeriesBlock(zones, 'flag')
    cfc = gfield.ClassifyFromColumns(
        zones, 'value', ['lo', 'hi'], ['a', 'b', 'c'], right=False)
    rnd = gfield.Round(gfield.Where(val, flag, 0.0), decimals=2)
    views['geometry_field_chain'] = SetSeriesBlock(
        zones, 'rounded', rnd, 'bucket', cfc)

    # temporal_closed_label: Resample(Cumulative(TemporalAggregate(
    #   Snap(radar, gauge), '4h', 'p95', closed/label='right',
    #   tz Europe/Amsterdam), 'sum', 'D', tz), '15min', 'backward', tz)
    # — pins the pandas-offset NORMALIZATION ('4h', '15min'), the
    # closed/label sides, a non-UTC timezone and the percentile
    # statistic spelling through all three temporal ops
    snapped = temporal.Snap(radar, gauge)
    ta = temporal.TemporalAggregate(
        snapped, '4h', statistic='p95', closed='right', label='right',
        timezone='Europe/Amsterdam')
    cum = temporal.Cumulative(
        ta, statistic='sum', frequency='D', timezone='Europe/Amsterdam')
    views['temporal_closed_label'] = temporal.Resample(
        cum, '15min', direction='backward', timezone='Europe/Amsterdam')

    # zonal_percentile_edges: Classify in its CLOSED-bin form
    # (len(labels) == len(bins)-1, right=True) over an AggregateRaster
    # with percentile statistic + auto_pixel_size — pins the other
    # Classify arity and the aggregate's optional args
    field_zones = gsources.GeometryFileSource('/data/fields.gpkg')
    fdem = RasterFileSource('/data/dem.tif')
    fagg = gagg.AggregateRaster(
        field_zones, fdem, statistic='p95', projection='EPSG:28992',
        pixel_size=0.5, max_pixels=1000000, column_name='p95',
        auto_pixel_size=True)
    fcls = gfield.Classify(GetSeriesBlock(fagg, 'p95'),
                           [0.0, 1.0, 2.0], ['a', 'b'], right=True)
    views['zonal_percentile_edges'] = SetSeriesBlock(
        fagg, 'edge_class', fcls)

    return views


TOKEN_RE = re.compile(r'_[0-9a-f]{32}$')


def canonical(doc):
    """Replace token suffixes with CONTENT-derived names (recursive md5 of
    class path + canonicalized args) so two captures with different
    tokenizers — or different graph-dict insertion orders — compare
    structurally."""
    graph = doc['graph']
    memo = {}

    def fingerprint(name):
        if name in memo:
            return memo[name]
        entry = graph[name]
        canon_args = [canon_val(a) for a in entry[1:]]
        fp = (TOKEN_RE.sub('', name) + '#' + hashlib.md5(
            json.dumps([entry[0]] + canon_args, sort_keys=True).encode())
            .hexdigest()[:8])
        memo[name] = fp
        return fp

    def canon_val(v):
        if isinstance(v, str) and TOKEN_RE.search(v) and v in graph:
            return fingerprint(v)
        if isinstance(v, list):
            return [canon_val(x) for x in v]
        return v

    out = {}
    for n in graph:
        out[fingerprint(n)] = [graph[n][0]] + [canon_val(x) for x in graph[n][1:]]
    return {'version': doc.get('version'), 'name': fingerprint(doc['name']),
            'graph': dict(sorted(out.items()))}


def main():
    install_stubs()
    sys.path.insert(0, '/root/reference')
    views = build_graphs()
    outdir = '/tmp/captured_views'
    os.makedirs(outdir, exist_ok=True)
    fixdir = os.path.join(os.path.dirname(__file__), '..',
                          'src/test/resources/reference_views')
    status = 0
    for name, block in views.items():
        # round-trip through JSON first: the fixture is JSON, and the
        # in-memory doc may hold tuples where JSON has lists
        doc = json.loads(json.dumps(block.serialize()))
        with open(f'{outdir}/{name}.json', 'w') as f:
            json.dump(doc, f, indent=2)
        fix_path = os.path.join(fixdir, f'{name}.json')
        if not os.path.exists(fix_path):
            print(f'{name}: NO FIXTURE (captured to {outdir}/{name}.json — '
                  'review and commit it)')
            status = 1
            continue
        with open(fix_path) as f:
            fixture = json.load(f)
        got = canonical(doc)
        want = canonical(fixture)
        if got == want:
            print(f'{name}: MATCH (structure, import paths, args)')
        else:
            status = 1
            print(f'{name}: DIFF')
            print('  captured:', json.dumps(got, sort_keys=True)[:400])
            print('  fixture :', json.dumps(want, sort_keys=True)[:400])
    sys.exit(status)


if __name__ == '__main__':
    main()
