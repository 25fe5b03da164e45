-- The `orders` wide mart: every order line denormalized with its truck,
-- menu, franchise, location, and (optional) loyalty-customer attributes.
-- Re-expression of reference dbt/models/marts/orders.sql:1-47 (5 inner
-- joins + 1 left join). Semantics notes:
--  * order_header.location_id is FLOAT joined to location's NUMBER(19,0)
--    key in the reference (cross-type equi-join, setup_data.sql:86 vs
--    :34) -- Spark's numeric promotion handles it identically.
--  * order_header.order_failed exists in neither the reference DDL nor
--    its sources (SURVEY §1.4 ghost column) -- our fixtures add it so
--    the mart runs as written.
--  * the left join keeps anonymous orders (null customer_id rows).
select
    -- order identity & timing
    h.order_id
    , h.truck_id
    , h.order_ts
    , d.order_detail_id
    , d.line_number
    -- truck / brand
    , m.truck_brand_name
    , m.menu_type
    , t.primary_city
    , t.region
    , t.country
    , t.franchise_flag
    -- franchisee
    , t.franchise_id
    , f.first_name as franchisee_first_name
    , f.last_name as franchisee_last_name
    -- venue
    , loc.location_id
    -- loyalty customer (null for anonymous orders)
    , c.customer_id
    , c.first_name
    , c.last_name
    , c.e_mail
    , c.phone_number
    , c.children_count
    , c.gender
    , c.marital_status
    -- line item & money
    , d.menu_item_id
    , m.menu_item_name
    , d.quantity
    , d.unit_price
    , d.price
    , h.order_amount
    , h.order_tax_amount
    , h.order_discount_amount
    , h.order_total
    , h.order_failed
from {{ ref('raw_pos_order_detail') }} d
inner join {{ ref('raw_pos_order_header') }} h on d.order_id = h.order_id
inner join {{ ref('raw_pos_truck') }} t on h.truck_id = t.truck_id
inner join {{ ref('raw_pos_menu') }} m on d.menu_item_id = m.menu_item_id
inner join {{ ref('raw_pos_franchise') }} f on t.franchise_id = f.franchise_id
inner join {{ ref('raw_pos_location') }} loc on h.location_id = loc.location_id
left join {{ ref('raw_customer_customer_loyalty') }} c
    on h.customer_id = c.customer_id
